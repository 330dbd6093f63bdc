// ROS-free stand-in (bio_ik_tpu reference-baseline harness): the
// geometry_msgs pose types + tf2::fromMsg used by frame.h conversions.
#pragma once

#include <tf2/LinearMath/Quaternion.h>
#include <tf2/LinearMath/Vector3.h>

namespace geometry_msgs
{
struct Point
{
    double x = 0, y = 0, z = 0;
};
struct Quaternion
{
    double x = 0, y = 0, z = 0, w = 1;
};
struct Pose
{
    Point position;
    Quaternion orientation;
};
} // namespace geometry_msgs

namespace tf2
{
inline void fromMsg(const geometry_msgs::Quaternion& m, tf2::Quaternion& q)
{
    q = tf2::Quaternion(m.x, m.y, m.z, m.w);
}
inline void fromMsg(const geometry_msgs::Point& m, tf2::Vector3& v)
{
    v = tf2::Vector3(m.x, m.y, m.z);
}
} // namespace tf2
