// Part of the glm shim (see ../ext.hpp): debug to_string used by the
// reference's commented-out prints. Minimal stub.
#pragma once
#include <string>
#include "../ext.hpp"
namespace glm {
inline std::string to_string(const mat4 &) { return "mat4"; }
inline std::string to_string(const vec3 &) { return "vec3"; }
inline std::string to_string(const vec4 &) { return "vec4"; }
}
