// ROS-free stand-in (bio_ik_tpu reference-baseline harness): only the
// query-options base class bio_ik's goal.h subclasses.
#pragma once

namespace kinematics
{
struct KinematicsQueryOptions
{
    bool lock_redundant_joints = false;
    bool return_approximate_solution = false;
    virtual ~KinematicsQueryOptions() {}
};
} // namespace kinematics
