// Minimal ROS-free stand-in for the KDL frame types used by the reference
// (quaternion-backed Rotation; API + semantics-compatible subset only).
// Written from scratch for the bio_ik_tpu reference-baseline harness.
#pragma once

#include <cmath>

namespace KDL
{

class Vector
{
public:
    double data[3];
    Vector() { data[0] = data[1] = data[2] = 0.0; }
    Vector(double x, double y, double z)
    {
        data[0] = x; data[1] = y; data[2] = z;
    }
    double x() const { return data[0]; }
    double y() const { return data[1]; }
    double z() const { return data[2]; }
    void x(double v) { data[0] = v; }
    void y(double v) { data[1] = v; }
    void z(double v) { data[2] = v; }
    double operator[](int i) const { return data[i]; }
    double& operator[](int i) { return data[i]; }
    Vector operator+(const Vector& o) const
    {
        return Vector(data[0] + o.data[0], data[1] + o.data[1],
                      data[2] + o.data[2]);
    }
    Vector operator-(const Vector& o) const
    {
        return Vector(data[0] - o.data[0], data[1] - o.data[1],
                      data[2] - o.data[2]);
    }
    Vector operator/(double s) const
    {
        return Vector(data[0] / s, data[1] / s, data[2] / s);
    }
    static Vector Zero() { return Vector(); }
};

inline Vector diff(const Vector& a, const Vector& b, double dt = 1.0)
{
    return Vector((b.data[0] - a.data[0]) / dt, (b.data[1] - a.data[1]) / dt,
                  (b.data[2] - a.data[2]) / dt);
}

inline bool Equal(const Vector& a, const Vector& b, double eps = 1e-10)
{
    return std::fabs(a.data[0] - b.data[0]) <= eps &&
           std::fabs(a.data[1] - b.data[1]) <= eps &&
           std::fabs(a.data[2] - b.data[2]) <= eps;
}

// Quaternion-backed rotation (KDL stores a 3x3 matrix; only the subset of
// operations the reference uses is provided, with identical semantics).
class Rotation
{
public:
    double qx, qy, qz, qw;
    Rotation() : qx(0), qy(0), qz(0), qw(1) {}
    Rotation(double x, double y, double z, double w)
        : qx(x), qy(y), qz(z), qw(w) {}

    static Rotation Quaternion(double x, double y, double z, double w)
    {
        double n = std::sqrt(x * x + y * y + z * z + w * w);
        return Rotation(x / n, y / n, z / n, w / n);
    }
    Rotation Inverse() const { return Rotation(-qx, -qy, -qz, qw); }
    Vector operator*(const Vector& v) const
    {
        // r = v + 2 q_v x (q_v x v + w v)
        double tx = qy * v.data[2] - qz * v.data[1] + qw * v.data[0];
        double ty = qz * v.data[0] - qx * v.data[2] + qw * v.data[1];
        double tz = qx * v.data[1] - qy * v.data[0] + qw * v.data[2];
        return Vector(v.data[0] + 2.0 * (qy * tz - qz * ty),
                      v.data[1] + 2.0 * (qz * tx - qx * tz),
                      v.data[2] + 2.0 * (qx * ty - qy * tx));
    }
    Rotation operator*(const Rotation& o) const
    {
        return Rotation(
            qw * o.qx + qx * o.qw + qy * o.qz - qz * o.qy,
            qw * o.qy + qy * o.qw + qz * o.qx - qx * o.qz,
            qw * o.qz + qz * o.qw + qx * o.qy - qy * o.qx,
            qw * o.qw - qx * o.qx - qy * o.qy - qz * o.qz);
    }
    void GetQuaternion(double& x, double& y, double& z, double& w) const
    {
        x = qx; y = qy; z = qz; w = qw;
    }
    // axis * angle (KDL GetRot semantics)
    Vector GetRot() const
    {
        double vn = std::sqrt(qx * qx + qy * qy + qz * qz);
        if(vn < 1e-300) return Vector();
        double angle = 2.0 * std::atan2(vn, std::fabs(qw));
        double s = (qw < 0 ? -angle : angle) / vn;
        return Vector(qx * s, qy * s, qz * s);
    }
};

inline Vector diff(const Rotation& a, const Rotation& b, double dt = 1.0)
{
    Rotation rel = a.Inverse() * b;
    return a * rel.GetRot() / dt;
}

class Twist
{
public:
    Vector vel;
    Vector rot;
    Twist() {}
    Twist(const Vector& v, const Vector& r) : vel(v), rot(r) {}
    static Twist Zero() { return Twist(); }
};

inline bool Equal(const Twist& a, const Twist& b, double eps = 1e-10)
{
    return Equal(a.vel, b.vel, eps) && Equal(a.rot, b.rot, eps);
}

class Frame
{
public:
    Vector p;
    Rotation M;
    Frame() {}
    static Frame Identity() { return Frame(); }
};

} // namespace KDL
