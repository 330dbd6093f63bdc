// ROS-free stand-in (bio_ik_tpu reference-baseline harness).  Setting
// MOVEIT_FCL_VERSION == FCL 0.6 makes the reference's
// `#if (MOVEIT_FCL_VERSION < FCL_VERSION_CHECK(0, 6, 0))` guards false,
// compiling out TouchGoal and the FCL collision caches entirely.
#pragma once
#include <moveit/collision_detection/collision_common.h>

#define FCL_VERSION_CHECK(major, minor, patch) \
    ((major)*100000 + (minor)*1000 + (patch))
#define MOVEIT_FCL_VERSION FCL_VERSION_CHECK(0, 6, 0)
