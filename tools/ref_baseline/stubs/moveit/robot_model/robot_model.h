// ROS-free stand-in for the slice of moveit::core::RobotModel the
// reference's FK/solver layer uses, written from scratch for the
// bio_ik_tpu reference-baseline harness.  The model is built from a flat
// text spec dumped by tools/ref_baseline/run_baseline.py (one joint per
// line: name, type, parent link, child link, origin pos+quat, axis,
// variable bounds) instead of URDF+SRDF.
#pragma once

#include <cmath>
#include <fstream>
#include <map>
#include <memory>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

#include <Eigen/Dense>

namespace moveit
{
namespace core
{

struct VariableBounds
{
    double min_position_ = 0.0;
    double max_position_ = 0.0;
    bool position_bounded_ = true;
    double max_velocity_ = 0.0;
    bool velocity_bounded_ = false;
};

class LinkModel;
class RobotModel;

class JointModel
{
public:
    enum JointType
    {
        UNKNOWN,
        REVOLUTE,
        PRISMATIC,
        PLANAR,
        FLOATING,
        FIXED
    };

    std::string name_;
    JointType type_ = FIXED;
    int joint_index_ = -1;
    int first_variable_index_ = -1;
    std::vector<std::string> variable_names_;
    const JointModel* mimic_ = nullptr;
    double mimic_factor_ = 1.0, mimic_offset_ = 0.0;
    std::vector<const JointModel*> mimic_requests_;
    const LinkModel* parent_link_ = nullptr;
    const LinkModel* child_link_ = nullptr;

    virtual ~JointModel() {}
    const std::string& getName() const { return name_; }
    JointType getType() const { return type_; }
    int getJointIndex() const { return joint_index_; }
    int getFirstVariableIndex() const { return first_variable_index_; }
    size_t getVariableCount() const { return variable_names_.size(); }
    const std::vector<std::string>& getVariableNames() const
    {
        return variable_names_;
    }
    const JointModel* getMimic() const { return mimic_; }
    double getMimicFactor() const { return mimic_factor_; }
    double getMimicOffset() const { return mimic_offset_; }
    const std::vector<const JointModel*>& getMimicRequests() const
    {
        return mimic_requests_;
    }
    const LinkModel* getParentLinkModel() const { return parent_link_; }
    const LinkModel* getChildLinkModel() const { return child_link_; }

    virtual void computeTransform(const double* v,
                                  Eigen::Isometry3d& t) const
    {
        (void)v;
        t = Eigen::Isometry3d::Identity();
    }
};

class RevoluteJointModel : public JointModel
{
public:
    Eigen::Vector3d axis_;
    const Eigen::Vector3d& getAxis() const { return axis_; }
};

class PrismaticJointModel : public JointModel
{
public:
    Eigen::Vector3d axis_;
    const Eigen::Vector3d& getAxis() const { return axis_; }
};

class FloatingJointModel : public JointModel
{
public:
    void computeTransform(const double* v, Eigen::Isometry3d& t) const override
    {
        double n = std::sqrt(v[3] * v[3] + v[4] * v[4] + v[5] * v[5] +
                             v[6] * v[6]);
        t = Eigen::Isometry3d::fromPosQuat(v[0], v[1], v[2], v[3] / n,
                                           v[4] / n, v[5] / n, v[6] / n);
    }
};

class PlanarJointModel : public JointModel
{
public:
    void computeTransform(const double* v, Eigen::Isometry3d& t) const override
    {
        t = Eigen::Isometry3d::fromPosQuat(v[0], v[1], 0.0, 0.0, 0.0,
                                           std::sin(v[2] * 0.5),
                                           std::cos(v[2] * 0.5));
    }
};

class LinkModel
{
public:
    std::string name_;
    int link_index_ = -1;
    const JointModel* parent_joint_ = nullptr;
    const LinkModel* parent_link_ = nullptr;
    Eigen::Isometry3d joint_origin_transform_;

    const std::string& getName() const { return name_; }
    int getLinkIndex() const { return link_index_; }
    const JointModel* getParentJointModel() const { return parent_joint_; }
    const LinkModel* getParentLinkModel() const { return parent_link_; }
    const Eigen::Isometry3d& getJointOriginTransform() const
    {
        return joint_origin_transform_;
    }
};

class RobotModel
{
public:
    std::vector<std::unique_ptr<JointModel>> joints_own_;
    std::vector<std::unique_ptr<LinkModel>> links_own_;
    std::vector<const JointModel*> joints_;
    std::vector<const LinkModel*> links_;
    std::vector<std::string> link_names_;
    std::vector<std::string> variable_names_;
    std::map<std::string, int> variable_index_;
    std::map<std::string, const JointModel*> joint_by_name_;
    std::map<std::string, const LinkModel*> link_by_name_;
    std::vector<VariableBounds> bounds_;
    std::vector<const JointModel*> joint_of_variable_;
    std::vector<const JointModel*> mimic_joints_;

    size_t getVariableCount() const { return variable_names_.size(); }
    size_t getLinkModelCount() const { return links_.size(); }
    size_t getJointModelCount() const { return joints_.size(); }
    const std::vector<const JointModel*>& getJointModels() const
    {
        return joints_;
    }
    const std::vector<const LinkModel*>& getLinkModels() const
    {
        return links_;
    }
    const std::vector<std::string>& getLinkModelNames() const
    {
        return link_names_;
    }
    const LinkModel* getLinkModel(size_t i) const { return links_[i]; }
    const LinkModel* getLinkModel(const std::string& name) const
    {
        auto it = link_by_name_.find(name);
        return it == link_by_name_.end() ? nullptr : it->second;
    }
    const JointModel* getJointModel(size_t i) const { return joints_[i]; }
    const JointModel* getJointModel(const std::string& name) const
    {
        auto it = joint_by_name_.find(name);
        return it == joint_by_name_.end() ? nullptr : it->second;
    }
    const JointModel* getJointOfVariable(int i) const
    {
        return joint_of_variable_[i];
    }
    const JointModel* getJointOfVariable(const std::string& name) const
    {
        return joint_of_variable_[getVariableIndex(name)];
    }
    int getVariableIndex(const std::string& name) const
    {
        auto it = variable_index_.find(name);
        if(it == variable_index_.end())
            throw std::runtime_error("unknown variable " + name);
        return it->second;
    }
    const std::vector<std::string>& getVariableNames() const
    {
        return variable_names_;
    }
    const VariableBounds& getVariableBounds(const std::string& name) const
    {
        return bounds_[getVariableIndex(name)];
    }
    const std::vector<const JointModel*>& getMimicJointModels() const
    {
        return mimic_joints_;
    }
    void interpolate(const double* a, const double* b, double t,
                     double* out) const
    {
        for(size_t i = 0; i < variable_names_.size(); i++)
            out[i] = a[i] + (b[i] - a[i]) * t;
        // mimic update, as MoveIt's interpolate performs
        for(auto* j : mimic_joints_)
            out[j->getFirstVariableIndex()] =
                out[j->getMimic()->getFirstVariableIndex()] *
                    j->getMimicFactor() +
                j->getMimicOffset();
    }

    // ---- harness loader (see run_baseline.py for the dump format) ----
    static std::shared_ptr<RobotModel> loadSpec(const std::string& path);
};

typedef std::shared_ptr<const RobotModel> RobotModelConstPtr;

inline std::shared_ptr<RobotModel> RobotModel::loadSpec(
    const std::string& path)
{
    auto model = std::make_shared<RobotModel>();
    std::ifstream f(path);
    if(!f) throw std::runtime_error("cannot open robot spec " + path);
    // implicit root link
    std::string line;
    auto add_link = [&](const std::string& name) -> LinkModel* {
        auto lm = std::make_unique<LinkModel>();
        lm->name_ = name;
        lm->link_index_ = (int)model->links_.size();
        LinkModel* p = lm.get();
        model->links_.push_back(p);
        model->link_names_.push_back(name);
        model->link_by_name_[name] = p;
        model->links_own_.push_back(std::move(lm));
        return p;
    };
    std::map<std::string, std::pair<std::string, std::pair<double, double>>>
        pending_mimic; // joint -> (source joint, (factor, offset))
    while(std::getline(f, line))
    {
        if(line.empty() || line[0] == '#') continue;
        std::istringstream ss(line);
        std::string tag;
        ss >> tag;
        if(tag == "root")
        {
            std::string name;
            ss >> name;
            auto* root = add_link(name);
            // MoveIt gives the root link a (fixed) virtual root joint;
            // the reference's FK walks parent joints unconditionally
            auto jm = std::make_unique<JointModel>();
            jm->name_ = "__root_joint__";
            jm->type_ = JointModel::FIXED;
            jm->joint_index_ = (int)model->joints_.size();
            jm->child_link_ = root;
            root->parent_joint_ = jm.get();
            model->joints_.push_back(jm.get());
            model->joint_by_name_[jm->name_] = jm.get();
            model->joints_own_.push_back(std::move(jm));
        }
        else if(tag == "joint")
        {
            std::string name, type, parent, child;
            double px, py, pz, qx, qy, qz, qw, ax, ay, az;
            ss >> name >> type >> parent >> child >> px >> py >> pz >> qx >>
                qy >> qz >> qw >> ax >> ay >> az;
            std::unique_ptr<JointModel> jm;
            if(type == "revolute" || type == "continuous")
            {
                auto j = std::make_unique<RevoluteJointModel>();
                j->axis_ = Eigen::Vector3d(ax, ay, az);
                j->type_ = JointModel::REVOLUTE;
                jm = std::move(j);
            }
            else if(type == "prismatic")
            {
                auto j = std::make_unique<PrismaticJointModel>();
                j->axis_ = Eigen::Vector3d(ax, ay, az);
                j->type_ = JointModel::PRISMATIC;
                jm = std::move(j);
            }
            else if(type == "floating")
            {
                jm = std::make_unique<FloatingJointModel>();
                jm->type_ = JointModel::FLOATING;
            }
            else if(type == "planar")
            {
                jm = std::make_unique<PlanarJointModel>();
                jm->type_ = JointModel::PLANAR;
            }
            else
            {
                jm = std::make_unique<JointModel>();
                jm->type_ = JointModel::FIXED;
            }
            jm->name_ = name;
            jm->joint_index_ = (int)model->joints_.size();
            auto* parent_link = model->link_by_name_.at(parent);
            auto* child_link = add_link(child);
            child_link->parent_joint_ = jm.get();
            child_link->parent_link_ = parent_link;
            child_link->joint_origin_transform_ =
                Eigen::Isometry3d::fromPosQuat(px, py, pz, qx, qy, qz, qw);
            jm->parent_link_ = parent_link;
            jm->child_link_ = child_link;
            model->joints_.push_back(jm.get());
            model->joint_by_name_[name] = jm.get();
            model->joints_own_.push_back(std::move(jm));
        }
        else if(tag == "var")
        {
            // var <joint> <name> <min> <max> <bounded 0|1> <max_velocity>
            std::string joint, name;
            double mn, mx, vel;
            int bounded;
            ss >> joint >> name >> mn >> mx >> bounded >> vel;
            auto* jm = const_cast<JointModel*>(model->joint_by_name_.at(joint));
            if(jm->first_variable_index_ < 0)
                jm->first_variable_index_ = (int)model->variable_names_.size();
            jm->variable_names_.push_back(name);
            model->variable_index_[name] = (int)model->variable_names_.size();
            model->variable_names_.push_back(name);
            VariableBounds vb;
            vb.min_position_ = mn;
            vb.max_position_ = mx;
            vb.position_bounded_ = bounded != 0;
            vb.max_velocity_ = vel;
            vb.velocity_bounded_ = vel > 0;
            model->bounds_.push_back(vb);
            model->joint_of_variable_.push_back(jm);
            model->variable_index_[name] =
                (int)model->variable_names_.size() - 1;
        }
        else if(tag == "mimic")
        {
            // mimic <joint> <source_joint> <factor> <offset>
            std::string joint, src;
            double factor, offset;
            ss >> joint >> src >> factor >> offset;
            pending_mimic[joint] = {src, {factor, offset}};
        }
    }
    for(auto& [jname, m] : pending_mimic)
    {
        auto* jm = const_cast<JointModel*>(model->joint_by_name_.at(jname));
        auto* src = const_cast<JointModel*>(model->joint_by_name_.at(m.first));
        jm->mimic_ = src;
        jm->mimic_factor_ = m.second.first;
        jm->mimic_offset_ = m.second.second;
        src->mimic_requests_.push_back(jm);
        model->mimic_joints_.push_back(jm);
    }
    return model;
}

} // namespace core
} // namespace moveit
