// Minimal ROS-free stand-in for tf2::Quaternion (API-compatible subset),
// written from scratch for the bio_ik_tpu reference-baseline harness.
// Layout matches tf2 (x, y, z, w doubles).
#pragma once

#include <cmath>

#include "Vector3.h"

namespace tf2
{

class Quaternion
{
public:
    double m_floats[4];

    Quaternion()
    {
        m_floats[0] = m_floats[1] = m_floats[2] = 0.0;
        m_floats[3] = 1.0;
    }
    Quaternion(double x, double y, double z, double w)
    {
        m_floats[0] = x; m_floats[1] = y; m_floats[2] = z; m_floats[3] = w;
    }

    double x() const { return m_floats[0]; }
    double y() const { return m_floats[1]; }
    double z() const { return m_floats[2]; }
    double w() const { return m_floats[3]; }
    double getX() const { return m_floats[0]; }
    double getY() const { return m_floats[1]; }
    double getZ() const { return m_floats[2]; }
    double getW() const { return m_floats[3]; }
    void setX(double v) { m_floats[0] = v; }
    void setY(double v) { m_floats[1] = v; }
    void setZ(double v) { m_floats[2] = v; }
    void setW(double v) { m_floats[3] = v; }
    void setValue(double x, double y, double z, double w)
    {
        m_floats[0] = x; m_floats[1] = y; m_floats[2] = z; m_floats[3] = w;
    }

    double dot(const Quaternion& o) const
    {
        return m_floats[0] * o.m_floats[0] + m_floats[1] * o.m_floats[1] +
               m_floats[2] * o.m_floats[2] + m_floats[3] * o.m_floats[3];
    }
    double length2() const { return dot(*this); }
    double length() const { return std::sqrt(length2()); }
    Quaternion& operator*=(double s)
    {
        m_floats[0] *= s; m_floats[1] *= s; m_floats[2] *= s;
        m_floats[3] *= s;
        return *this;
    }
    Quaternion& operator/=(double s) { return *this *= (1.0 / s); }
    Quaternion& normalize() { return *this /= length(); }
    Quaternion normalized() const
    {
        Quaternion q = *this;
        q.normalize();
        return q;
    }
    // tf2 semantics: inverse == conjugate (unit quaternions)
    Quaternion inverse() const
    {
        return Quaternion(-m_floats[0], -m_floats[1], -m_floats[2],
                          m_floats[3]);
    }
    double getAngle() const
    {
        return 2.0 * std::acos(m_floats[3]);
    }
    double angle(const Quaternion& o) const
    {
        double s = std::sqrt(length2() * o.length2());
        return std::acos(dot(o) / s);
    }
    double angleShortestPath(const Quaternion& o) const
    {
        double s = std::sqrt(length2() * o.length2());
        double d = dot(o);
        if(d < 0) return std::acos(-d / s) * 2.0;
        return std::acos(d / s) * 2.0;
    }
    static const Quaternion& getIdentity()
    {
        static const Quaternion q(0, 0, 0, 1);
        return q;
    }
    Vector3 getAxis() const
    {
        double s2 = 1.0 - m_floats[3] * m_floats[3];
        if(s2 < 10.0 * 1.192092896e-07)
            return Vector3(1.0, 0.0, 0.0);
        double s = 1.0 / std::sqrt(s2);
        return Vector3(m_floats[0] * s, m_floats[1] * s, m_floats[2] * s);
    }
    Quaternion& operator+=(const Quaternion& o)
    {
        for(int i = 0; i < 4; i++) m_floats[i] += o.m_floats[i];
        return *this;
    }
    Quaternion& operator-=(const Quaternion& o)
    {
        for(int i = 0; i < 4; i++) m_floats[i] -= o.m_floats[i];
        return *this;
    }
};

inline Quaternion operator*(const Quaternion& p, const Quaternion& q)
{
    return Quaternion(
        p.w() * q.x() + p.x() * q.w() + p.y() * q.z() - p.z() * q.y(),
        p.w() * q.y() + p.y() * q.w() + p.z() * q.x() - p.x() * q.z(),
        p.w() * q.z() + p.z() * q.w() + p.x() * q.y() - p.y() * q.x(),
        p.w() * q.w() - p.x() * q.x() - p.y() * q.y() - p.z() * q.z());
}
inline Quaternion operator-(const Quaternion& q)
{
    return Quaternion(-q.x(), -q.y(), -q.z(), -q.w());
}
inline Quaternion operator+(const Quaternion& a, const Quaternion& b)
{
    return Quaternion(a.x() + b.x(), a.y() + b.y(), a.z() + b.z(),
                      a.w() + b.w());
}
inline Quaternion operator-(const Quaternion& a, const Quaternion& b)
{
    return Quaternion(a.x() - b.x(), a.y() - b.y(), a.z() - b.z(),
                      a.w() - b.w());
}
inline Quaternion operator*(const Quaternion& q, double s)
{
    return Quaternion(q.x() * s, q.y() * s, q.z() * s, q.w() * s);
}

} // namespace tf2
