// Minimal glm API shim so the REFERENCE renderer (/root/reference) compiles
// in this image (which has no glm) to produce golden images. This is an
// original implementation of the small public-glm surface the reference
// uses (column-major mat4, translate/scale/rotate/inverse/inverseTranspose);
// it contains no glm or reference code.
#pragma once
#include <cmath>

namespace glm {

struct vec3 {
    float v[3];
    vec3() : v{0, 0, 0} {}
    vec3(float x, float y, float z) : v{x, y, z} {}
    float &operator[](int i) { return v[i]; }
    const float &operator[](int i) const { return v[i]; }
    vec3 operator*(float s) const { return {v[0] * s, v[1] * s, v[2] * s}; }
    vec3 operator+(const vec3 &o) const {
        return {v[0] + o[0], v[1] + o[1], v[2] + o[2]};
    }
};

struct vec4 {
    float v[4];
    vec4() : v{0, 0, 0, 0} {}
    vec4(float x, float y, float z, float w) : v{x, y, z, w} {}
    float &operator[](int i) { return v[i]; }
    const float &operator[](int i) const { return v[i]; }
    // vec3 = mat4 * vec4 truncation, as glm allows via explicit ctor use
    operator vec3() const { return vec3(v[0], v[1], v[2]); }
};

// column-major, like glm: m[col][row]
struct mat4 {
    vec4 c[4];
    mat4() {}
    explicit mat4(float d) {
        for (int i = 0; i < 4; i++)
            for (int j = 0; j < 4; j++) c[i][j] = (i == j) ? d : 0.0f;
    }
    vec4 &operator[](int i) { return c[i]; }
    const vec4 &operator[](int i) const { return c[i]; }
};

inline vec4 operator*(const mat4 &m, const vec4 &p) {
    vec4 r;
    for (int row = 0; row < 4; row++)
        r[row] = m[0][row] * p[0] + m[1][row] * p[1] + m[2][row] * p[2] +
                 m[3][row] * p[3];
    return r;
}

inline mat4 operator*(const mat4 &a, const mat4 &b) {
    mat4 r;
    for (int i = 0; i < 4; i++)
        for (int j = 0; j < 4; j++) {
            float s = 0;
            for (int k = 0; k < 4; k++) s += a[k][j] * b[i][k];
            r[i][j] = s;
        }
    return r;
}

inline float radians(float deg) { return deg * 0.01745329251994329577f; }

inline mat4 translate(const mat4 &m, const vec3 &t) {
    mat4 tr(1.0f);
    tr[3][0] = t[0];
    tr[3][1] = t[1];
    tr[3][2] = t[2];
    return m * tr;
}

inline mat4 scale(const mat4 &m, const vec3 &s) {
    mat4 sc(1.0f);
    sc[0][0] = s[0];
    sc[1][1] = s[1];
    sc[2][2] = s[2];
    return m * sc;
}

inline mat4 rotate(const mat4 &m, float angle, const vec3 &axis_in) {
    float len = std::sqrt(axis_in[0] * axis_in[0] + axis_in[1] * axis_in[1] +
                          axis_in[2] * axis_in[2]);
    vec3 a(axis_in[0] / len, axis_in[1] / len, axis_in[2] / len);
    float c = std::cos(angle), s = std::sin(angle), t = 1.0f - c;
    mat4 r(1.0f);
    r[0][0] = c + a[0] * a[0] * t;
    r[0][1] = a[1] * a[0] * t + a[2] * s;
    r[0][2] = a[2] * a[0] * t - a[1] * s;
    r[1][0] = a[0] * a[1] * t - a[2] * s;
    r[1][1] = c + a[1] * a[1] * t;
    r[1][2] = a[2] * a[1] * t + a[0] * s;
    r[2][0] = a[0] * a[2] * t + a[1] * s;
    r[2][1] = a[1] * a[2] * t - a[0] * s;
    r[2][2] = c + a[2] * a[2] * t;
    return m * r;
}

inline mat4 transpose(const mat4 &m) {
    mat4 r;
    for (int i = 0; i < 4; i++)
        for (int j = 0; j < 4; j++) r[i][j] = m[j][i];
    return r;
}

// general 4x4 inverse by cofactor expansion
inline mat4 inverse(const mat4 &mm) {
    // flatten row-major for the cofactor math: e[row][col]
    float e[4][4];
    for (int i = 0; i < 4; i++)
        for (int j = 0; j < 4; j++) e[j][i] = mm[i][j];
    auto det3 = [&](int r0, int r1, int r2, int c0, int c1, int c2) {
        return e[r0][c0] * (e[r1][c1] * e[r2][c2] - e[r1][c2] * e[r2][c1]) -
               e[r0][c1] * (e[r1][c0] * e[r2][c2] - e[r1][c2] * e[r2][c0]) +
               e[r0][c2] * (e[r1][c0] * e[r2][c1] - e[r1][c1] * e[r2][c0]);
    };
    float cof[4][4];
    int rows[4][3] = {{1, 2, 3}, {0, 2, 3}, {0, 1, 3}, {0, 1, 2}};
    for (int i = 0; i < 4; i++)
        for (int j = 0; j < 4; j++) {
            float m3 = det3(rows[i][0], rows[i][1], rows[i][2], rows[j][0],
                            rows[j][1], rows[j][2]);
            cof[i][j] = (((i + j) & 1) ? -m3 : m3);
        }
    float det = e[0][0] * cof[0][0] + e[0][1] * cof[0][1] +
                e[0][2] * cof[0][2] + e[0][3] * cof[0][3];
    float inv_det = 1.0f / det;
    mat4 r;
    // inverse = adjugate^T / det; back to column-major storage
    for (int i = 0; i < 4; i++)
        for (int j = 0; j < 4; j++) r[i][j] = cof[i][j] * inv_det;
    return r;
}

inline mat4 inverseTranspose(const mat4 &m) { return transpose(inverse(m)); }

}  // namespace glm
