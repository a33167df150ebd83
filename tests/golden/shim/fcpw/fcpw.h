// Declaration-only FCPW stub: the reference's FCPWQueries strategy is
// compiled but never instantiated by the golden generator (the reference
// itself ships with it commented out, src/sdf/OctreeSdf.cpp:63). These
// declarations satisfy phase-1 name lookup only.
#ifndef GOLDEN_FCPW_STUB_H
#define GOLDEN_FCPW_STUB_H
#include <initializer_list>
#include <vector>
namespace fcpw {
struct Vector3 { float x, y, z; };
enum class PrimitiveType { Triangle };
enum class AggregateType { Bvh_Volume };
template <int N> struct Interaction {
    int primitiveIndex = 0;
    float d = 0.0f;
};
template <int N> struct Scene {
    void setObjectTypes(std::initializer_list<std::vector<PrimitiveType>>);
    void setObjectVertexCount(unsigned, int);
    void setObjectTriangleCount(unsigned, int);
    void setObjectVertex(const Vector3&, int, int);
    void setObjectTriangle(const int*, int, int);
    void build(AggregateType, bool);
    void findClosestPoint(const Vector3&, Interaction<N>&);
};
}  // namespace fcpw
#endif
