// Golden-value generator for REFERENCE BUILDER parity tests.
//
// Unlike gen_golden.cpp (which compiles the reference's scalar kernels),
// this program compiles and runs the reference's actual BUILDERS and
// QUERY methods:
//   * OctreeSdf with InitAlgorithm::NO_CONTINUITY
//     (src/sdf/OctreeSdfDepthFirst.h) and CONTINUITY no-delay
//     (src/sdf/OctreeSdfBreadthFirstNoDelay.h:83-1226), VHQueries +
//     TriCubicInterpolation — the reference's default configuration;
//   * ExactOctreeSdf (include/SdfLib/ExactOctreeSdfDepthFirst.h:27-683);
//   * the COMPILED OctreeSdf::getDistance / ExactOctreeSdf::getDistance
//     (src/sdf/OctreeSdf.cpp:93-152, src/sdf/ExactOctreeSdf.cpp:38-178) —
//     not a re-statement;
//   * cereal-PortableBinary .bin containers written through the
//     reference's own save() templates (OctreeSdf.h:221-237,
//     ExactOctreeSdf.h:137-160) via the functional mini-cereal shim.
//
// This is a TEST ORACLE, not part of the shipped framework.
//
// Modes:
//   gen_builders build <mesh.raw> <points.raw> <out_prefix>
//               <maxDepth> <startDepth> <minTrisPerNode> <maxError>
//     Builds all three structures on the mesh (box = cubified mesh AABB
//     + 20% margin, matching tools/SdfExporter/main.cpp:63-66), writes
//     <prefix>_octree_nc.bin, <prefix>_octree_cont.bin, <prefix>_exact.bin
//     and per-structure *_dist.raw / *_grad.raw query results.
//   gen_builders exactquery <exact.bin> <points.raw> <out_prefix>
//     Loads ANY exact-octree .bin through the compiled reference load()
//     and queries it — used to validate sdflib_tpu's own .bin writer.
//
// File formats match gen_golden.cpp (little-endian raw arrays).

#include <chrono>
#include <cstdio>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <fstream>
#include <string>
#include <vector>

#include "SdfLib/OctreeSdf.h"
#include "SdfLib/ExactOctreeSdf.h"
#include "SdfLib/utils/Mesh.h"

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
    template <typename T> T get() {
        T v; std::memcpy(&v, p, sizeof(T)); p += sizeof(T); return v;
    }
};

static Mesh loadMeshRaw(const char* path, std::vector<glm::vec3>& verts,
                        std::vector<uint32_t>& indices) {
    std::vector<uint8_t> mb = readFile(path);
    Cursor mc{mb.data()};
    uint32_t nv = mc.get<uint32_t>();
    uint32_t nt = mc.get<uint32_t>();
    verts.resize(nv);
    std::memcpy(verts.data(), mc.p, nv * 12); mc.p += nv * 12;
    indices.resize(nt * 3);
    std::memcpy(indices.data(), mc.p, nt * 12);
    Mesh mesh(verts.data(), nv, indices.data(), nt * 3);
    // Match the assimp loading path: it computes the bounding box the
    // raw-pointer ctor skips (see gen_golden.cpp runDist note).
    mesh.computeBoundingBox();
    return mesh;
}

static std::vector<glm::vec3> loadPointsRaw(const char* path) {
    std::vector<uint8_t> pb = readFile(path);
    Cursor pc{pb.data()};
    uint32_t n = pc.get<uint32_t>();
    std::vector<glm::vec3> pts(n);
    std::memcpy(pts.data(), pc.p, n * 12);
    return pts;
}

template <typename Sdf>
static void queryAndDump(const Sdf& sdf, const std::vector<glm::vec3>& pts,
                         const std::string& prefix) {
    std::vector<float> dists(pts.size()), grads(pts.size() * 3);
    for (size_t i = 0; i < pts.size(); ++i) {
        glm::vec3 g(0.0f);
        dists[i] = sdf.getDistance(pts[i], g);
        grads[3 * i] = g.x; grads[3 * i + 1] = g.y; grads[3 * i + 2] = g.z;
    }
    writeFile(prefix + "_dist.raw", dists.data(), dists.size() * 4);
    writeFile(prefix + "_grad.raw", grads.data(), grads.size() * 4);
}

template <typename Sdf>
static void saveBin(Sdf& sdf, const std::string& path) {
    // SdfFunction::saveToFile semantics (src/sdf/SdfFunction.cpp:9-42):
    // format enum first, then the object through its save() template.
    std::ofstream os(path, std::ios::out | std::ios::binary);
    cereal::PortableBinaryOutputArchive archive(os);
    SdfFunction::SdfFormat format = sdf.getFormat();
    archive(format);
    archive(sdf);
}

static int runBuild(int argc, char** argv) {
    const char* meshPath = argv[2];
    const char* ptsPath = argv[3];
    std::string prefix = argv[4];
    uint32_t maxDepth = std::atoi(argv[5]);
    uint32_t startDepth = std::atoi(argv[6]);
    uint32_t minTris = std::atoi(argv[7]);
    float maxError = std::atof(argv[8]);

    std::vector<glm::vec3> verts;
    std::vector<uint32_t> indices;
    Mesh mesh = loadMeshRaw(meshPath, verts, indices);
    std::vector<glm::vec3> pts = loadPointsRaw(ptsPath);

    // SdfExporter box prep (src/tools/SdfExporter/main.cpp:63-66): the
    // mesh AABB with a 20% margin added as a fraction of its size.
    BoundingBox box = mesh.getBoundingBox();
    const glm::vec3 modelBBSize = box.getSize();
    box.addMargin(0.2f * glm::max(glm::max(modelBBSize.x, modelBBSize.y),
                                  modelBBSize.z));

    {
        OctreeSdf oct(mesh, box, maxDepth, startDepth, maxError,
                      OctreeSdf::InitAlgorithm::NO_CONTINUITY, 1);
        saveBin(oct, prefix + "_octree_nc.bin");
        queryAndDump(oct, pts, prefix + "_octree_nc");
        std::printf("octree_nc: %zu words\n", oct.getOctreeData().size());
    }
    {
        OctreeSdf oct(mesh, box, maxDepth, startDepth, maxError,
                      OctreeSdf::InitAlgorithm::CONTINUITY, 1);
        saveBin(oct, prefix + "_octree_cont.bin");
        queryAndDump(oct, pts, prefix + "_octree_cont");
        std::printf("octree_cont: %zu words\n", oct.getOctreeData().size());
    }
    {
        ExactOctreeSdf ex(mesh, box, maxDepth, startDepth, minTris, 1);
        saveBin(ex, prefix + "_exact.bin");
        queryAndDump(ex, pts, prefix + "_exact");
        std::printf("exact: %zu nodes\n", ex.getOctreeData().size());
    }
    return 0;
}

static int runBuildExact(int argc, char** argv) {
    // buildexact <mesh.raw> <points.raw> <out_prefix> <maxDepth>
    //            <startDepth> <minTris> [numThreads]
    // Times ONLY the exact builder (the big-mesh baseline probe: the
    // `build` mode also builds both approx octrees first, which at
    // depth-7/100k-triangle scale costs more wall time than the datum
    // is worth).
    const char* meshPath = argv[2];
    const char* ptsPath = argv[3];
    std::string prefix = argv[4];
    uint32_t maxDepth = std::atoi(argv[5]);
    uint32_t startDepth = std::atoi(argv[6]);
    uint32_t minTris = std::atoi(argv[7]);
    uint32_t nthreads = (argc > 8) ? std::atoi(argv[8]) : 1;

    std::vector<glm::vec3> verts;
    std::vector<uint32_t> indices;
    Mesh mesh = loadMeshRaw(meshPath, verts, indices);
    std::vector<glm::vec3> pts = loadPointsRaw(ptsPath);
    BoundingBox box = mesh.getBoundingBox();
    const glm::vec3 modelBBSize = box.getSize();
    box.addMargin(0.2f * glm::max(glm::max(modelBBSize.x, modelBBSize.y),
                                  modelBBSize.z));

    auto t0 = std::chrono::steady_clock::now();
    ExactOctreeSdf ex(mesh, box, maxDepth, startDepth, minTris, nthreads);
    double buildS = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();
    saveBin(ex, prefix + "_exact.bin");

    auto q0 = std::chrono::steady_clock::now();
    queryAndDump(ex, pts, prefix + "_exact");
    double queryS = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - q0).count();
    std::printf(
        "buildexact: build_s=%.2f nodes=%zu threads=%u query_s=%.3f "
        "points=%zu qps=%.0f\n",
        buildS, ex.getOctreeData().size(), nthreads, queryS, pts.size(),
        pts.size() / queryS);
    return 0;
}

static int runExactQuery(int argc, char** argv) {
    const char* binPath = argv[2];
    const char* ptsPath = argv[3];
    std::string prefix = argv[4];

    std::ifstream is(binPath, std::ios::binary);
    if (!is.is_open()) { std::fprintf(stderr, "cannot open %s\n", binPath); return 2; }
    cereal::PortableBinaryInputArchive archive(is);
    SdfFunction::SdfFormat format = SdfFunction::SdfFormat::NONE;
    archive(format);
    if (format != SdfFunction::SdfFormat::EXACT_OCTREE) {
        std::fprintf(stderr, "not an EXACT_OCTREE container\n");
        return 2;
    }
    ExactOctreeSdf ex;
    archive(ex);
    std::vector<glm::vec3> pts = loadPointsRaw(ptsPath);
    queryAndDump(ex, pts, prefix);
    std::printf("exactquery: %zu points\n", pts.size());
    return 0;
}

int main(int argc, char** argv) {
    if (argc >= 9 && std::string(argv[1]) == "build") return runBuild(argc, argv);
    if (argc >= 8 && std::string(argv[1]) == "buildexact") return runBuildExact(argc, argv);
    if (argc >= 5 && std::string(argv[1]) == "exactquery") return runExactQuery(argc, argv);
    std::fprintf(stderr,
                 "usage: gen_builders build <mesh.raw> <points.raw> <out_prefix>"
                 " <maxDepth> <startDepth> <minTris> <maxError>\n"
                 "       gen_builders exactquery <exact.bin> <points.raw> <out_prefix>\n");
    return 2;
}
