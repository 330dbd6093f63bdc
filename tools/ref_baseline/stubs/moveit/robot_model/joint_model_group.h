// ROS-free stand-in (bio_ik_tpu reference-baseline harness).
#pragma once

#include <moveit/robot_model/robot_model.h>

namespace moveit
{
namespace core
{

class JointModelGroup
{
public:
    const RobotModel* parent_ = nullptr;
    std::vector<const JointModel*> active_joints_;
    std::vector<std::string> variable_names_;

    const RobotModel& getParentModel() const { return *parent_; }
    const std::vector<std::string>& getVariableNames() const
    {
        return variable_names_;
    }
    const std::vector<const JointModel*>& getActiveJointModels() const
    {
        return active_joints_;
    }

    // harness helper: group over every non-fixed, non-mimic joint
    static JointModelGroup allActive(const RobotModel& m)
    {
        JointModelGroup g;
        g.parent_ = &m;
        for(auto* j : m.getJointModels())
        {
            if(j->getType() == JointModel::FIXED) continue;
            if(j->getMimic()) continue;
            g.active_joints_.push_back(j);
            for(auto& n : j->getVariableNames())
                g.variable_names_.push_back(n);
        }
        return g;
    }
};

} // namespace core
} // namespace moveit
