// Minimal GLM-compatible math shim for compiling the reference SdfLib
// headers as a *golden-value generator* (test oracle only — never shipped
// in the framework). Provides exactly the subset the reference headers
// use: vec2/vec3/ivec3/dvec3/mat3x3/mat4, component accessors, arithmetic,
// dot/cross/normalize/length, inverse/transpose of 3x3, clamp/sign/min/
// max/abs/floor/fract/isnan/acos/sqrt. Semantics follow GLM: column-major
// matrices, m[i] = column i, operator* is mat·vec.
//
// This file is an original implementation (not copied from GLM).
#ifndef GOLDEN_GLM_SHIM_HPP
#define GOLDEN_GLM_SHIM_HPP

#include <cmath>
#include <cstdint>

namespace glm {

template <typename T> struct tvec4;

template <typename T> struct tvec2 {
    T x, y;
    tvec2() : x(0), y(0) {}
    explicit tvec2(T s) : x(s), y(s) {}
    tvec2(T x_, T y_) : x(x_), y(y_) {}
    template <typename V> explicit tvec2(const V& v) : x(T(v.x)), y(T(v.y)) {}
    T& operator[](int i) { return (&x)[i]; }
    const T& operator[](int i) const { return (&x)[i]; }
};

template <typename T> struct tvec3 {
    T x, y, z;
    tvec3() : x(0), y(0), z(0) {}
    explicit tvec3(T s) : x(s), y(s), z(s) {}
    tvec3(T x_, T y_, T z_) : x(x_), y(y_), z(z_) {}
    template <typename U>
    tvec3(const tvec3<U>& v) : x(T(v.x)), y(T(v.y)), z(T(v.z)) {}
    template <typename U>
    explicit tvec3(const tvec4<U>& v) : x(T(v.x)), y(T(v.y)), z(T(v.z)) {}
    T& operator[](int i) { return (&x)[i]; }
    const T& operator[](int i) const { return (&x)[i]; }
};

template <typename T> struct tvec4 {
    T x, y, z, w;
    tvec4() : x(0), y(0), z(0), w(0) {}
    tvec4(T x_, T y_, T z_, T w_) : x(x_), y(y_), z(z_), w(w_) {}
    template <typename U>
    tvec4(const tvec3<T>& v, U w_) : x(v.x), y(v.y), z(v.z), w(T(w_)) {}
    T& operator[](int i) { return (&x)[i]; }
    const T& operator[](int i) const { return (&x)[i]; }
};

typedef tvec2<float> vec2;
typedef tvec3<float> vec3;
typedef tvec4<float> vec4;
typedef tvec3<double> dvec3;
typedef tvec3<int> ivec3;
typedef tvec3<unsigned int> uvec3;

// ---- vec2 ops --------------------------------------------------------------
inline vec2 operator+(vec2 a, vec2 b) { return vec2(a.x + b.x, a.y + b.y); }
inline vec2 operator-(vec2 a, vec2 b) { return vec2(a.x - b.x, a.y - b.y); }
inline vec2 operator*(float s, vec2 v) { return vec2(s * v.x, s * v.y); }
inline vec2 operator*(vec2 v, float s) { return vec2(v.x * s, v.y * s); }
inline vec2 operator/(vec2 v, float s) { return vec2(v.x / s, v.y / s); }
inline float dot(vec2 a, vec2 b) { return a.x * b.x + a.y * b.y; }

// ---- vec3 ops --------------------------------------------------------------
template <typename T>
inline tvec3<T> operator+(tvec3<T> a, tvec3<T> b) {
    return tvec3<T>(a.x + b.x, a.y + b.y, a.z + b.z);
}
template <typename T>
inline tvec3<T> operator-(tvec3<T> a, tvec3<T> b) {
    return tvec3<T>(a.x - b.x, a.y - b.y, a.z - b.z);
}
template <typename T> inline tvec3<T> operator-(tvec3<T> v) {
    return tvec3<T>(-v.x, -v.y, -v.z);
}
template <typename T> inline tvec3<T> operator*(T s, tvec3<T> v) {
    return tvec3<T>(s * v.x, s * v.y, s * v.z);
}
template <typename T> inline tvec3<T> operator*(tvec3<T> v, T s) {
    return tvec3<T>(v.x * s, v.y * s, v.z * s);
}
template <typename T> inline tvec3<T> operator*(tvec3<T> a, tvec3<T> b) {
    return tvec3<T>(a.x * b.x, a.y * b.y, a.z * b.z);
}
template <typename T> inline tvec3<T> operator/(tvec3<T> v, T s) {
    return tvec3<T>(v.x / s, v.y / s, v.z / s);
}
template <typename T> inline tvec3<T> operator/(tvec3<T> a, tvec3<T> b) {
    return tvec3<T>(a.x / b.x, a.y / b.y, a.z / b.z);
}
template <typename T> inline tvec3<T> operator/(T s, tvec3<T> v) {
    return tvec3<T>(s / v.x, s / v.y, s / v.z);
}
template <typename T> inline tvec3<T>& operator+=(tvec3<T>& a, tvec3<T> b) {
    a.x += b.x; a.y += b.y; a.z += b.z; return a;
}
template <typename T> inline tvec3<T>& operator-=(tvec3<T>& a, tvec3<T> b) {
    a.x -= b.x; a.y -= b.y; a.z -= b.z; return a;
}
template <typename T> inline tvec3<T>& operator/=(tvec3<T>& a, T s) {
    a.x /= s; a.y /= s; a.z /= s; return a;
}
template <typename T> inline bool operator==(tvec3<T> a, tvec3<T> b) {
    return a.x == b.x && a.y == b.y && a.z == b.z;
}
template <typename T> inline tvec3<T> operator+(tvec3<T> v, T s) {
    return tvec3<T>(v.x + s, v.y + s, v.z + s);
}
template <typename T> inline tvec3<T> operator-(tvec3<T> v, T s) {
    return tvec3<T>(v.x - s, v.y - s, v.z - s);
}
template <typename T> inline T dot(tvec3<T> a, tvec3<T> b) {
    return a.x * b.x + a.y * b.y + a.z * b.z;
}
template <typename T> inline tvec3<T> cross(tvec3<T> a, tvec3<T> b) {
    return tvec3<T>(a.y * b.z - a.z * b.y,
                    a.z * b.x - a.x * b.z,
                    a.x * b.y - a.y * b.x);
}
template <typename T> inline T length(tvec3<T> v) {
    return std::sqrt(dot(v, v));
}
inline float length(vec2 v) { return std::sqrt(dot(v, v)); }
template <typename T> inline tvec3<T> normalize(tvec3<T> v) {
    return v * (T(1) / std::sqrt(dot(v, v)));
}
inline vec2 normalize(vec2 v) {
    float inv = 1.0f / std::sqrt(dot(v, v));
    return vec2(v.x * inv, v.y * inv);
}
template <typename T> inline tvec3<T> abs(tvec3<T> v) {
    return tvec3<T>(std::abs(v.x), std::abs(v.y), std::abs(v.z));
}
inline float abs(float v) { return std::abs(v); }
template <typename T> inline tvec3<T> min(tvec3<T> a, tvec3<T> b) {
    return tvec3<T>(a.x < b.x ? a.x : b.x, a.y < b.y ? a.y : b.y,
                    a.z < b.z ? a.z : b.z);
}
template <typename T> inline tvec3<T> max(tvec3<T> a, tvec3<T> b) {
    return tvec3<T>(a.x > b.x ? a.x : b.x, a.y > b.y ? a.y : b.y,
                    a.z > b.z ? a.z : b.z);
}
inline float min(float a, float b) { return a < b ? a : b; }
inline float max(float a, float b) { return a > b ? a : b; }
inline float clamp(float v, float lo, float hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}
inline float sign(float v) { return (v > 0.f) - (v < 0.f); }
inline float sqrt(float v) { return std::sqrt(v); }
inline float acos(float v) { return std::acos(v); }
inline float tan(float v) { return std::tan(v); }
inline float radians(float deg) { return deg * 0.01745329251994329577f; }
inline bool isnan(float v) { return std::isnan(v); }
template <typename T> inline tvec3<bool> isnan(tvec3<T> v) {
    return tvec3<bool>(std::isnan(v.x), std::isnan(v.y), std::isnan(v.z));
}
template <typename T> inline tvec3<T> floor(tvec3<T> v) {
    return tvec3<T>(std::floor(v.x), std::floor(v.y), std::floor(v.z));
}
template <typename T> inline tvec3<T> fract(tvec3<T> v) {
    return v - floor(v);
}
inline float fract(float v) { return v - std::floor(v); }
inline float round(float v) { return std::round(v); }
template <typename T> inline tvec3<T> round(tvec3<T> v) {
    return tvec3<T>(std::round(v.x), std::round(v.y), std::round(v.z));
}
inline float pow(float a, float b) { return std::pow(a, b); }
template <typename T> inline tvec3<T> ceil(tvec3<T> v) {
    return tvec3<T>(std::ceil(v.x), std::ceil(v.y), std::ceil(v.z));
}
inline float ceil(float v) { return std::ceil(v); }
template <typename T> inline tvec3<T> sign(tvec3<T> v) {
    return tvec3<T>(T((v.x > 0) - (v.x < 0)), T((v.y > 0) - (v.y < 0)),
                    T((v.z > 0) - (v.z < 0)));
}
inline float log2(float v) { return std::log2(v); }
inline float floor(float v) { return std::floor(v); }

// ---- mat3 (column-major: m[i] is column i) ---------------------------------
struct mat3x3 {
    vec3 c[3];
    mat3x3() {}
    explicit mat3x3(float d) {
        c[0] = vec3(d, 0, 0); c[1] = vec3(0, d, 0); c[2] = vec3(0, 0, d);
    }
    mat3x3(vec3 c0, vec3 c1, vec3 c2) { c[0] = c0; c[1] = c1; c[2] = c2; }
    vec3& operator[](int i) { return c[i]; }
    const vec3& operator[](int i) const { return c[i]; }
};
typedef mat3x3 mat3;

struct mat4 {
    tvec4<float> c[4];
    mat4() {}
    explicit mat4(float d) {
        c[0] = tvec4<float>(d, 0, 0, 0); c[1] = tvec4<float>(0, d, 0, 0);
        c[2] = tvec4<float>(0, 0, d, 0); c[3] = tvec4<float>(0, 0, 0, d);
    }
    tvec4<float>& operator[](int i) { return c[i]; }
    const tvec4<float>& operator[](int i) const { return c[i]; }
};

inline tvec4<float> operator*(const mat4& m, tvec4<float> v) {
    tvec4<float> r(0, 0, 0, 0);
    for (int i = 0; i < 4; ++i)
        for (int j = 0; j < 4; ++j) r[i] += m[j][i] * v[j];
    return r;
}

inline vec3 operator*(const mat3x3& m, vec3 v) {
    return vec3(m[0].x * v.x + m[1].x * v.y + m[2].x * v.z,
                m[0].y * v.x + m[1].y * v.y + m[2].y * v.z,
                m[0].z * v.x + m[1].z * v.y + m[2].z * v.z);
}

inline mat3x3 transpose(const mat3x3& m) {
    return mat3x3(vec3(m[0].x, m[1].x, m[2].x),
                  vec3(m[0].y, m[1].y, m[2].y),
                  vec3(m[0].z, m[1].z, m[2].z));
}

inline mat3x3 inverse(const mat3x3& m) {
    // Cofactor expansion, one-over-determinant scaling (GLM's method).
    float det = m[0].x * (m[1].y * m[2].z - m[2].y * m[1].z)
              - m[1].x * (m[0].y * m[2].z - m[2].y * m[0].z)
              + m[2].x * (m[0].y * m[1].z - m[1].y * m[0].z);
    float inv = 1.0f / det;
    mat3x3 r;
    r[0].x = +(m[1].y * m[2].z - m[2].y * m[1].z) * inv;
    r[1].x = -(m[1].x * m[2].z - m[2].x * m[1].z) * inv;
    r[2].x = +(m[1].x * m[2].y - m[2].x * m[1].y) * inv;
    r[0].y = -(m[0].y * m[2].z - m[2].y * m[0].z) * inv;
    r[1].y = +(m[0].x * m[2].z - m[2].x * m[0].z) * inv;
    r[2].y = -(m[0].x * m[2].y - m[2].x * m[0].y) * inv;
    r[0].z = +(m[0].y * m[1].z - m[1].y * m[0].z) * inv;
    r[1].z = -(m[0].x * m[1].z - m[1].x * m[0].z) * inv;
    r[2].z = +(m[0].x * m[1].y - m[1].x * m[0].y) * inv;
    return r;
}

}  // namespace glm

#endif  // GOLDEN_GLM_SHIM_HPP
