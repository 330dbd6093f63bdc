// ROS-free stand-in (bio_ik_tpu reference-baseline harness): RobotState is
// only touched by the reference's RobotFK_MoveIt comparison oracle, which
// this harness never instantiates — methods abort if ever reached.
#pragma once

#include <cstdlib>
#include <vector>

#include <moveit/robot_model/robot_model.h>

namespace moveit
{
namespace core
{

class RobotState
{
public:
    RobotModelConstPtr model_;
    explicit RobotState(const RobotModelConstPtr& model) : model_(model) {}
    void setVariablePositions(const std::vector<double>&) { std::abort(); }
    void update() { std::abort(); }
    const Eigen::Isometry3d& getGlobalLinkTransform(const LinkModel*)
    {
        std::abort();
    }
};

} // namespace core
} // namespace moveit
