// Golden-value generator for cross-implementation parity tests.
//
// Compiles the REFERENCE SdfLib scalar kernels (point-triangle distance /
// pseudonormal sign, TriangleData precompute incl. non-manifold merge,
// tricubic fit/eval, octree query walk) straight from the reference headers
// at /root/reference against minimal shims (glm/spdlog/cereal in ./shim).
// The emitted binary files are checked into tests/golden/data/ so the
// pytest parity suite runs without the reference checkout or a compiler.
//
// This is a TEST ORACLE, not part of the shipped framework.
//
// Modes:
//   gen_golden dist <mesh.raw> <points.raw> <out_prefix>
//     Brute-force signed distance + gradient at each point over all
//     triangles (RealSdf semantics, reference src/sdf/RealSdf.cpp:10-25;
//     kernels TriangleUtils.h:76-290). Also dumps the TriangleData array
//     (origin, transform columns, b, c, v2, v3, edge/vertex pseudonormals —
//     37 f32/triangle) to check the precompute path.
//   gen_golden tricubic <corners.raw> <fracs.raw> <out_prefix>
//     TriCubicInterpolation::calculateCoefficients + interpolateValue +
//     interpolateGradient (InterpolationMethods.h:292-455).
//   gen_golden octree <octree.bin> <points.raw> <out_prefix>
//     Parses the cereal-PortableBinary OCTREE .bin container, runs the
//     reference query walk (src/sdf/OctreeSdf.cpp:93-152 semantics,
//     re-stated here over the flat array) and writes distance + gradient
//     per point; also re-writes the container byte-identically through its
//     own writer (reader parity check).
//
// File formats (all little-endian):
//   mesh.raw    = u32 nv, u32 nt, f32 verts[nv*3], u32 indices[nt*3]
//   points.raw  = u32 n, f32 pts[n*3]
//   corners.raw = u32 n, f32 corner_values[n*8*8], f32 node_sizes[n]
//   fracs.raw   = u32 n, f32 fracs[n*3]

#include <cstdio>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>
#include <array>

#include "SdfLib/utils/TriangleUtils.h"
#include "SdfLib/InterpolationMethods.h"

using namespace sdflib;

static std::vector<uint8_t> readFile(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) { std::fprintf(stderr, "cannot open %s\n", path); std::exit(2); }
    std::fseek(f, 0, SEEK_END);
    long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf(n);
    if (std::fread(buf.data(), 1, n, f) != (size_t)n) std::exit(2);
    std::fclose(f);
    return buf;
}

static void writeFile(const std::string& path, const void* data, size_t n) {
    FILE* f = std::fopen(path.c_str(), "wb");
    if (!f) { std::fprintf(stderr, "cannot write %s\n", path.c_str()); std::exit(2); }
    std::fwrite(data, 1, n, f);
    std::fclose(f);
}

struct Cursor {
    const uint8_t* p;
    const uint8_t* end;
    template <typename T> T get() {
        T v;
        std::memcpy(&v, p, sizeof(T));
        p += sizeof(T);
        return v;
    }
};

static int runDist(const char* meshPath, const char* ptsPath,
                   const std::string& outPrefix) {
    std::vector<uint8_t> mb = readFile(meshPath);
    Cursor mc{mb.data(), mb.data() + mb.size()};
    uint32_t nv = mc.get<uint32_t>();
    uint32_t nt = mc.get<uint32_t>();
    std::vector<glm::vec3> verts(nv);
    std::memcpy(verts.data(), mc.p, nv * 12); mc.p += nv * 12;
    std::vector<uint32_t> indices(nt * 3);
    std::memcpy(indices.data(), mc.p, nt * 12);

    Mesh mesh(verts.data(), nv, indices.data(), nt * 3);
    // The reference raw-pointer ctor (src/utils/Mesh.cpp:34-42) does NOT
    // compute the bounding box (a latent reference bug: the non-manifold
    // merge's spatial hash needs it, TriangleUtils.cpp:318-322). The assimp
    // file-loading path computes it — match that behavior, which is what
    // every reference tool actually runs.
    mesh.computeBoundingBox();
    std::vector<TriangleUtils::TriangleData> tris =
        TriangleUtils::calculateMeshTriangleData(mesh);

    // TriangleData dump: 37 f32 per triangle, transform as 3 columns
    // (matching the TriangleData cereal field order, TriangleUtils.h:50-54).
    std::vector<float> dump;
    dump.reserve(tris.size() * 37);
    for (const auto& t : tris) {
        for (int i = 0; i < 3; ++i) dump.push_back(t.origin[i]);
        for (int c = 0; c < 3; ++c)
            for (int r = 0; r < 3; ++r) dump.push_back(t.transform[c][r]);
        dump.push_back(t.b.x); dump.push_back(t.b.y);
        dump.push_back(t.c.x); dump.push_back(t.c.y);
        dump.push_back(t.v2);
        dump.push_back(t.v3.x); dump.push_back(t.v3.y);
        for (int e = 0; e < 3; ++e)
            for (int i = 0; i < 3; ++i) dump.push_back(t.edgesNormal[e][i]);
        for (int v = 0; v < 3; ++v)
            for (int i = 0; i < 3; ++i) dump.push_back(t.verticesNormal[v][i]);
    }
    writeFile(outPrefix + "_tridata.raw", dump.data(), dump.size() * 4);

    std::vector<uint8_t> pb = readFile(ptsPath);
    Cursor pc{pb.data(), pb.data() + pb.size()};
    uint32_t n = pc.get<uint32_t>();
    std::vector<glm::vec3> pts(n);
    std::memcpy(pts.data(), pc.p, n * 12);

    // RealSdf semantics (src/sdf/RealSdf.cpp:10-25): argmin over squared
    // distance with strict-< updates, then one signed evaluation.
    std::vector<float> dists(n), grads(n * 3);
    for (uint32_t i = 0; i < n; ++i) {
        float best = INFINITY;
        uint32_t bi = 0;
        for (uint32_t tIdx = 0; tIdx < tris.size(); ++tIdx) {
            float d = TriangleUtils::getSqDistPointAndTriangle(pts[i], tris[tIdx]);
            if (d < best) { best = d; bi = tIdx; }
        }
        glm::vec3 grad(0.0f);
        dists[i] = TriangleUtils::getSignedDistPointAndTriangle(
            pts[i], tris[bi],
            verts[indices[3 * bi]], verts[indices[3 * bi + 1]],
            verts[indices[3 * bi + 2]], grad);
        grads[3 * i] = grad.x; grads[3 * i + 1] = grad.y; grads[3 * i + 2] = grad.z;
    }
    writeFile(outPrefix + "_dist.raw", dists.data(), n * 4);
    writeFile(outPrefix + "_grad.raw", grads.data(), n * 12);
    std::printf("dist: %u points, %zu triangles\n", n, tris.size());
    return 0;
}

static int runTricubic(const char* cornersPath, const char* fracsPath,
                       const std::string& outPrefix) {
    std::vector<uint8_t> cb = readFile(cornersPath);
    Cursor cc{cb.data(), cb.data() + cb.size()};
    uint32_t n = cc.get<uint32_t>();
    std::vector<float> corners(n * 64);
    std::memcpy(corners.data(), cc.p, n * 64 * 4); cc.p += n * 64 * 4;
    std::vector<float> nodeSizes(n);
    std::memcpy(nodeSizes.data(), cc.p, n * 4);

    std::vector<uint8_t> fb = readFile(fracsPath);
    Cursor fc{fb.data(), fb.data() + fb.size()};
    uint32_t nf = fc.get<uint32_t>();
    std::vector<glm::vec3> fracs(nf);
    std::memcpy(fracs.data(), fc.p, nf * 12);
    if (nf != n) { std::fprintf(stderr, "count mismatch\n"); return 2; }

    Mesh dummyMesh;
    std::vector<TriangleUtils::TriangleData> dummyTris;
    std::vector<uint32_t> dummyIdx;

    std::vector<float> coeffsOut(n * 64), vals(n), grads(n * 3);
    for (uint32_t i = 0; i < n; ++i) {
        std::array<std::array<float, 8>, 8> inValues;
        for (int c = 0; c < 8; ++c)
            for (int v = 0; v < 8; ++v)
                inValues[c][v] = corners[i * 64 + c * 8 + v];
        std::array<float, 64> coeff;
        TriCubicInterpolation::calculateCoefficients(
            inValues, nodeSizes[i], dummyIdx, dummyMesh, dummyTris, coeff);
        std::memcpy(&coeffsOut[i * 64], coeff.data(), 64 * 4);
        vals[i] = TriCubicInterpolation::interpolateValue(coeff, fracs[i]);
        glm::vec3 g = TriCubicInterpolation::interpolateGradient(coeff, fracs[i]);
        grads[3 * i] = g.x; grads[3 * i + 1] = g.y; grads[3 * i + 2] = g.z;
    }
    writeFile(outPrefix + "_coeffs.raw", coeffsOut.data(), n * 64 * 4);
    writeFile(outPrefix + "_value.raw", vals.data(), n * 4);
    writeFile(outPrefix + "_grad.raw", grads.data(), n * 12);
    std::printf("tricubic: %u samples\n", n);
    return 0;
}

// Flat-array octree query walk with the reference's exact semantics
// (src/sdf/OctreeSdf.cpp:86-152: roundFloat >= 0.5, leaf bit 31, 29-bit
// children index, tricubic leaf evaluation, box+minBorder out-of-domain
// fallback via BoundingBox::getDistance, utils/Mesh.h:42-63).
struct OctreeGolden {
    BoundingBox box;
    int32_t startGridSize = 0;
    uint32_t maxDepth = 0;
    float valueRange = 0, minBorderValue = 0;
    std::vector<uint32_t> data;

    static constexpr uint32_t IS_LEAF = 1u << 31;
    static constexpr uint32_t CHILD_MASK = ~(3u << 30);

    float getDistance(glm::vec3 p, glm::vec3* outGrad) const {
        glm::vec3 cellSize = box.getSize() / (float)startGridSize;
        glm::vec3 frac = (p - box.min) / cellSize.x;
        glm::ivec3 cell((int)std::floor(frac.x), (int)std::floor(frac.y),
                        (int)std::floor(frac.z));
        frac = glm::fract(frac);
        if (cell.x < 0 || cell.x >= startGridSize || cell.y < 0 ||
            cell.y >= startGridSize || cell.z < 0 || cell.z >= startGridSize) {
            if (outGrad) return box.getDistance(p, *outGrad) + minBorderValue;
            return box.getDistance(p) + minBorderValue;
        }
        uint32_t node = data[(cell.z * startGridSize + cell.y) * startGridSize + cell.x];
        while (!(node & IS_LEAF)) {
            uint32_t child = ((frac.z >= 0.5f ? 1u : 0u) << 2) |
                             ((frac.y >= 0.5f ? 1u : 0u) << 1) |
                             (frac.x >= 0.5f ? 1u : 0u);
            node = data[(node & CHILD_MASK) + child];
            frac = glm::fract(2.0f * frac);
        }
        std::array<float, 64> coeff;
        std::memcpy(coeff.data(), &data[node & CHILD_MASK], 64 * 4);
        if (outGrad)
            *outGrad = glm::normalize(
                TriCubicInterpolation::interpolateGradient(coeff, frac));
        return TriCubicInterpolation::interpolateValue(coeff, frac);
    }
};

static int runOctree(const char* binPath, const char* ptsPath,
                     const std::string& outPrefix) {
    std::vector<uint8_t> bb = readFile(binPath);
    Cursor c{bb.data(), bb.data() + bb.size()};
    uint8_t endian = c.get<uint8_t>();
    int32_t fmt = c.get<int32_t>();
    if (endian != 1 || fmt != 1) {
        std::fprintf(stderr, "not a little-endian OCTREE container\n");
        return 2;
    }
    OctreeGolden oct;
    oct.box.min = glm::vec3(c.get<float>(), c.get<float>(), c.get<float>());
    oct.box.max = glm::vec3(c.get<float>(), c.get<float>(), c.get<float>());
    oct.startGridSize = c.get<int32_t>();
    oct.maxDepth = c.get<uint32_t>();
    oct.valueRange = c.get<float>();
    oct.minBorderValue = c.get<float>();
    uint64_t count = c.get<uint64_t>();
    oct.data.resize(count);
    std::memcpy(oct.data.data(), c.p, count * 4);
    c.p += count * 4;

    std::vector<uint8_t> pb = readFile(ptsPath);
    Cursor pc{pb.data(), pb.data() + pb.size()};
    uint32_t n = pc.get<uint32_t>();
    std::vector<glm::vec3> pts(n);
    std::memcpy(pts.data(), pc.p, n * 12);

    std::vector<float> dists(n), grads(n * 3);
    for (uint32_t i = 0; i < n; ++i) {
        glm::vec3 g(0.0f);
        dists[i] = oct.getDistance(pts[i], &g);
        grads[3 * i] = g.x; grads[3 * i + 1] = g.y; grads[3 * i + 2] = g.z;
    }
    writeFile(outPrefix + "_dist.raw", dists.data(), n * 4);
    writeFile(outPrefix + "_grad.raw", grads.data(), n * 12);

    // Re-write the container through this program's own writer: a C++-
    // produced .bin for the Python reader-parity test.
    std::vector<uint8_t> out;
    auto push = [&out](const void* p, size_t n) {
        const uint8_t* b = (const uint8_t*)p;
        out.insert(out.end(), b, b + n);
    };
    uint8_t one = 1; push(&one, 1);
    push(&fmt, 4);
    push(&oct.box.min, 12); push(&oct.box.max, 12);
    push(&oct.startGridSize, 4); push(&oct.maxDepth, 4);
    push(&oct.valueRange, 4); push(&oct.minBorderValue, 4);
    uint64_t cnt = oct.data.size(); push(&cnt, 8);
    push(oct.data.data(), oct.data.size() * 4);
    writeFile(outPrefix + "_rewrite.bin", out.data(), out.size());
    std::printf("octree: %u points, %llu words\n", n,
                (unsigned long long)count);
    return 0;
}

int main(int argc, char** argv) {
    if (argc < 5) {
        std::fprintf(stderr,
                     "usage: gen_golden <dist|tricubic|octree> <in1> <in2> "
                     "<out_prefix>\n");
        return 2;
    }
    std::string mode = argv[1];
    if (mode == "dist") return runDist(argv[2], argv[3], argv[4]);
    if (mode == "tricubic") return runTricubic(argv[2], argv[3], argv[4]);
    if (mode == "octree") return runOctree(argv[2], argv[3], argv[4]);
    std::fprintf(stderr, "unknown mode %s\n", mode.c_str());
    return 2;
}
