// ROS-free stand-in (bio_ik_tpu reference-baseline harness): only the
// wall-clock the reference's optional profiler references.
#pragma once

#include <chrono>

namespace ros
{
struct WallTime
{
    double t;
    static WallTime now()
    {
        using C = std::chrono::steady_clock;
        return WallTime{std::chrono::duration<double>(
                            C::now().time_since_epoch())
                            .count()};
    }
    double toSec() const { return t; }
};
} // namespace ros
