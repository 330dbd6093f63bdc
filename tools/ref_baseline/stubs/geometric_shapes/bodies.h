// ROS-free stand-in (bio_ik_tpu reference-baseline harness).
#pragma once
#include <geometric_shapes/shapes.h>
namespace bodies
{
}
