// ROS-free stand-in (bio_ik_tpu reference-baseline harness): TouchGoal is
// compiled out via the MOVEIT_FCL_VERSION guard, so nothing is needed here.
#pragma once
#include <memory>
namespace shapes
{
class Shape
{
public:
    virtual ~Shape() {}
};
typedef std::shared_ptr<const Shape> ShapeConstPtr;
} // namespace shapes
