// ROS-free stand-in (bio_ik_tpu reference-baseline harness).
#pragma once
#include <memory>
namespace collision_detection
{
typedef std::shared_ptr<const void> FCLGeometryConstPtr;
}
