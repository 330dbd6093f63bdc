// ROS-free stand-in (bio_ik_tpu reference-baseline harness).
#pragma once
#include <kdl/frames.hpp>
