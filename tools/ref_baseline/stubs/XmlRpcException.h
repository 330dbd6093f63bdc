// ROS-free XmlRpc stand-in (bio_ik_tpu reference-baseline harness): just
// enough for utils.h's XmlRpcReader to compile; never exercised at runtime.
#pragma once

#include <stdexcept>
#include <string>

namespace XmlRpc
{

struct XmlRpcException : std::runtime_error
{
    XmlRpcException(const std::string& s = "xmlrpc") : std::runtime_error(s) {}
};

class XmlRpcValue
{
public:
    enum Type
    {
        TypeInvalid,
        TypeBoolean,
        TypeInt,
        TypeDouble,
        TypeString,
        TypeDateTime,
        TypeBase64,
        TypeArray,
        TypeStruct
    };
    Type getType() const { return TypeInvalid; }
    XmlRpcValue& operator[](int) { throw XmlRpcException("unsupported"); }
    XmlRpcValue& operator[](const char*)
    {
        throw XmlRpcException("unsupported");
    }
    XmlRpcValue& operator[](const std::string&)
    {
        throw XmlRpcException("unsupported");
    }
    bool hasMember(const std::string&) const { return false; }
    operator bool() const { throw XmlRpcException("unsupported"); }
    operator int() const { throw XmlRpcException("unsupported"); }
    operator double() const { throw XmlRpcException("unsupported"); }
    operator std::string() const { throw XmlRpcException("unsupported"); }
};

} // namespace XmlRpc
