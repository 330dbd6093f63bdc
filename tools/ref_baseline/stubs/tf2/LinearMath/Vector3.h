// Minimal ROS-free stand-in for tf2::Vector3, written from scratch for the
// bio_ik_tpu reference-baseline harness (API-compatible subset only).
// Layout matches tf2 (4 doubles) so pointer-based SIMD access stays valid.
#pragma once

// std headers the real ROS/tf2 headers pull transitively and the
// reference sources rely on without including themselves
#include <algorithm>
#include <cfloat>
#include <cmath>
#include <iostream>
#include <map>
#include <memory>
#include <ostream>
#include <random>
#include <functional>
#include <set>

namespace tf2
{

typedef double tf2Scalar;

class Vector3
{
public:
    double m_floats[4];

    Vector3() { m_floats[0] = m_floats[1] = m_floats[2] = m_floats[3] = 0.0; }
    Vector3(double x, double y, double z)
    {
        m_floats[0] = x; m_floats[1] = y; m_floats[2] = z; m_floats[3] = 0.0;
    }

    double x() const { return m_floats[0]; }
    double y() const { return m_floats[1]; }
    double z() const { return m_floats[2]; }
    double w() const { return m_floats[3]; }
    double getX() const { return m_floats[0]; }
    double getY() const { return m_floats[1]; }
    double getZ() const { return m_floats[2]; }
    void setX(double v) { m_floats[0] = v; }
    void setY(double v) { m_floats[1] = v; }
    void setZ(double v) { m_floats[2] = v; }
    void setW(double v) { m_floats[3] = v; }
    void setValue(double x, double y, double z)
    {
        m_floats[0] = x; m_floats[1] = y; m_floats[2] = z; m_floats[3] = 0.0;
    }

    Vector3& operator+=(const Vector3& o)
    {
        m_floats[0] += o.m_floats[0]; m_floats[1] += o.m_floats[1];
        m_floats[2] += o.m_floats[2];
        return *this;
    }
    Vector3& operator-=(const Vector3& o)
    {
        m_floats[0] -= o.m_floats[0]; m_floats[1] -= o.m_floats[1];
        m_floats[2] -= o.m_floats[2];
        return *this;
    }
    Vector3& operator*=(double s)
    {
        m_floats[0] *= s; m_floats[1] *= s; m_floats[2] *= s;
        return *this;
    }
    Vector3& operator/=(double s) { return *this *= (1.0 / s); }

    double dot(const Vector3& o) const
    {
        return m_floats[0] * o.m_floats[0] + m_floats[1] * o.m_floats[1] +
               m_floats[2] * o.m_floats[2];
    }
    double length2() const { return dot(*this); }
    double length() const { return std::sqrt(length2()); }
    double distance(const Vector3& o) const;
    double distance2(const Vector3& o) const;
    Vector3& normalize() { return *this /= length(); }
    Vector3 normalized() const
    {
        Vector3 v = *this;
        v.normalize();
        return v;
    }
    Vector3 cross(const Vector3& o) const
    {
        return Vector3(
            m_floats[1] * o.m_floats[2] - m_floats[2] * o.m_floats[1],
            m_floats[2] * o.m_floats[0] - m_floats[0] * o.m_floats[2],
            m_floats[0] * o.m_floats[1] - m_floats[1] * o.m_floats[0]);
    }
    double angle(const Vector3& o) const
    {
        double s = std::sqrt(length2() * o.length2());
        return std::acos(dot(o) / s);
    }
};

inline Vector3 operator+(const Vector3& a, const Vector3& b)
{
    return Vector3(a.x() + b.x(), a.y() + b.y(), a.z() + b.z());
}
inline Vector3 operator-(const Vector3& a, const Vector3& b)
{
    return Vector3(a.x() - b.x(), a.y() - b.y(), a.z() - b.z());
}
inline Vector3 operator-(const Vector3& a)
{
    return Vector3(-a.x(), -a.y(), -a.z());
}
inline Vector3 operator*(const Vector3& a, double s)
{
    return Vector3(a.x() * s, a.y() * s, a.z() * s);
}
inline Vector3 operator*(double s, const Vector3& a) { return a * s; }
inline Vector3 operator*(const Vector3& a, const Vector3& b)
{
    return Vector3(a.x() * b.x(), a.y() * b.y(), a.z() * b.z());
}
inline Vector3 operator/(const Vector3& a, double s) { return a * (1.0 / s); }

inline double Vector3::distance2(const Vector3& o) const
{
    return (o - *this).length2();
}
inline double Vector3::distance(const Vector3& o) const
{
    return (o - *this).length();
}

} // namespace tf2
