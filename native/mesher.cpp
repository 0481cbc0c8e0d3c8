// Native marching-tetrahedra surface extractor for the TSDF voxel-block
// pool — the C++ runtime counterpart of gps_slam_tpu/tsdf/meshing.py
// (same algorithm, same case tables; capability equivalent of InfiniTAM's
// meshing engine, Engines/Meshing/*).  Meshing is host-side and
// save-time-only, but on large scenes the chunked-numpy path spends tens
// of seconds; this OpenMP C++ version is the production path, with the
// numpy implementation kept as a portable fallback and as the test oracle.
//
// Build: g++ -O3 -march=native -shared -fPIC -fopenmp mesher.cpp -o libmesher.so
// ABI: plain C, consumed through ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <atomic>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int BLOCK = 8;
constexpr uint32_t EMPTY = 0xFFFFFFFFu;
constexpr int COORD_BITS = 10;
constexpr int COORD_OFFSET = 1 << (COORD_BITS - 1);
constexpr uint32_t COORD_MASK = (1u << COORD_BITS) - 1;

// tetrahedron decomposition of the unit cube sharing the 0-7 diagonal
// (corner ids: bit0=x, bit1=y, bit2=z) — mirrors meshing.py _TETS
const int TETS[6][4] = {
    {0, 1, 3, 7}, {0, 3, 2, 7}, {0, 2, 6, 7},
    {0, 6, 4, 7}, {0, 4, 5, 7}, {0, 5, 1, 7},
};
const int TET_EDGES[6][2] = {{0, 1}, {0, 2}, {0, 3}, {1, 2}, {1, 3}, {2, 3}};

struct Tables {
    // per 4-bit inside-mask: up to 2 triangles of edge ids, -1 padded
    int cases[16][2][3];
    Tables() {
        for (auto &c : cases)
            for (auto &t : c)
                t[0] = t[1] = t[2] = -1;
        auto set = [&](int m, int k, int a, int b, int c) {
            cases[m][k][0] = a; cases[m][k][1] = b; cases[m][k][2] = c;
        };
        set(0b0001, 0, 0, 1, 2);
        set(0b0010, 0, 0, 4, 3);
        set(0b0100, 0, 1, 3, 5);
        set(0b1000, 0, 2, 5, 4);
        set(0b0011, 0, 1, 2, 4); set(0b0011, 1, 1, 4, 3);
        set(0b0101, 0, 0, 2, 5); set(0b0101, 1, 0, 5, 3);
        set(0b1001, 0, 0, 4, 5); set(0b1001, 1, 0, 5, 1);
        for (int m = 1; m < 15; ++m) {
            int comp = 0b1111 ^ m;
            if (cases[m][0][0] == -1 && cases[comp][0][0] != -1)
                for (int k = 0; k < 2; ++k)
                    if (cases[comp][k][0] != -1)
                        set(m, k, cases[comp][k][2], cases[comp][k][1],
                            cases[comp][k][0]);
        }
    }
};
const Tables TABLES;

inline uint32_t pack(int x, int y, int z) {
    return (uint32_t(x + COORD_OFFSET) & COORD_MASK)
         | ((uint32_t(y + COORD_OFFSET) & COORD_MASK) << COORD_BITS)
         | ((uint32_t(z + COORD_OFFSET) & COORD_MASK) << (2 * COORD_BITS));
}

struct HostHash {
    const uint32_t *keys;
    const int32_t *ptrs;
    int64_t size;
    int max_probes;
    int32_t lookup(int bx, int by, int bz) const {
        uint32_t key = pack(bx, by, bz);
        int64_t h = ((int64_t)bx * 73856093 ^ (int64_t)by * 19349669 ^
                     (int64_t)bz * 83492791) & (size - 1);
        // aligned-bucket probe (must mirror gps_slam_tpu/tsdf/hash.py)
        int64_t base = h & ~(int64_t)(max_probes - 1);
        for (int r = 0; r < max_probes; ++r) {
            int64_t slot = base + r;
            if (keys[slot] == key) return ptrs[slot];
        }
        return -1;
    }
};

inline int lin_id(int x, int y, int z) { return x + BLOCK * y + BLOCK * BLOCK * z; }

// 12 cube edges, axis-major (x-edges, y-edges, z-edges) — must match
// gps_slam_tpu/tsdf/meshing.py::_MC_EDGE_CORNERS, which also generates the
// 256-case triangle table passed in as mc_tri (the table is derived from
// cube topology at Python import time; see meshing.py).
struct MCEdges {
    int c[12][2];
    MCEdges() {
        int e = 0;
        for (int ax = 0; ax < 3; ++ax)
            for (int corner = 0; corner < 8; ++corner)
                if (!((corner >> ax) & 1)) {
                    c[e][0] = corner;
                    c[e][1] = corner | (1 << ax);
                    ++e;
                }
    }
};
const MCEdges MC_EDGES;
constexpr int MC_MAX_TRIS = 6;

}  // namespace

extern "C" {

// Returns the number of emitted vertices (3 per triangle), clamped to
// max_verts; out_verts/out_cols are [max_verts, 3] float32.
// algo: 0 = marching tetrahedra, 1 = classic marching cubes using the
// caller-provided [256, 3*MC_MAX_TRIS] int8 edge-index table (mc_tri,
// -1 padded; may be null when algo == 0).
int64_t extract_mesh(
    const uint32_t *table_keys, const int32_t *table_ptrs, int64_t hash_size,
    int max_probes, const uint32_t *block_coords, const float *sdf,
    const int16_t *w_depth, const uint8_t *color, int64_t n_blocks,
    float voxel_size, int require_weight, int algo, const int8_t *mc_tri,
    float *out_verts, float *out_cols, int64_t max_verts)
{
    HostHash hh{table_keys, table_ptrs, hash_size, max_probes};
    std::atomic<int64_t> cursor{0};

#pragma omp parallel
    {
        std::vector<float> lv, lc;
        lv.reserve(1 << 14);
        lc.reserve(1 << 14);
        float ext_sdf[9][9][9];
        int16_t ext_w[9][9][9];
        uint8_t ext_c[9][9][9][3];

#pragma omp for schedule(dynamic, 16)
        for (int64_t b = 0; b < n_blocks; ++b) {
            uint32_t packed = block_coords[b];
            if (packed == EMPTY) continue;
            int bx = int(packed & COORD_MASK) - COORD_OFFSET;
            int by = int((packed >> COORD_BITS) & COORD_MASK) - COORD_OFFSET;
            int bz = int((packed >> (2 * COORD_BITS)) & COORD_MASK) - COORD_OFFSET;

            // fill the 9^3 extended grid: own voxels + neighbor borders
            for (int z = 0; z < 9; ++z)
                for (int y = 0; y < 9; ++y)
                    for (int x = 0; x < 9; ++x) {
                        ext_sdf[x][y][z] = 1.0f;
                        ext_w[x][y][z] = 0;
                    }
            const float *bs = sdf + b * 512;
            const int16_t *bw = w_depth + b * 512;
            const uint8_t *bc = color + b * 512 * 3;
            for (int z = 0; z < 8; ++z)
                for (int y = 0; y < 8; ++y)
                    for (int x = 0; x < 8; ++x) {
                        int l = lin_id(x, y, z);
                        ext_sdf[x][y][z] = bs[l];
                        ext_w[x][y][z] = bw[l];
                        ext_c[x][y][z][0] = bc[3 * l];
                        ext_c[x][y][z][1] = bc[3 * l + 1];
                        ext_c[x][y][z][2] = bc[3 * l + 2];
                    }
            // 7 neighbor fills
            const int offs[7][3] = {{1,0,0},{0,1,0},{0,0,1},{1,1,0},{1,0,1},{0,1,1},{1,1,1}};
            for (auto &o : offs) {
                int32_t nb = hh.lookup(bx + o[0], by + o[1], bz + o[2]);
                if (nb < 0) continue;
                const float *ns = sdf + (int64_t)nb * 512;
                const int16_t *nw = w_depth + (int64_t)nb * 512;
                const uint8_t *nc = color + (int64_t)nb * 512 * 3;
                int x0 = o[0] ? 8 : 0, x1 = o[0] ? 9 : 8;
                int y0 = o[1] ? 8 : 0, y1 = o[1] ? 9 : 8;
                int z0 = o[2] ? 8 : 0, z1 = o[2] ? 9 : 8;
                for (int z = z0; z < z1; ++z)
                    for (int y = y0; y < y1; ++y)
                        for (int x = x0; x < x1; ++x) {
                            int sx = o[0] ? 0 : x, sy = o[1] ? 0 : y, sz = o[2] ? 0 : z;
                            int l = lin_id(sx, sy, sz);
                            ext_sdf[x][y][z] = ns[l];
                            ext_w[x][y][z] = nw[l];
                            ext_c[x][y][z][0] = nc[3 * l];
                            ext_c[x][y][z][1] = nc[3 * l + 1];
                            ext_c[x][y][z][2] = nc[3 * l + 2];
                        }
            }

            float basex = float(bx) * BLOCK, basey = float(by) * BLOCK,
                  basez = float(bz) * BLOCK;
            for (int cz = 0; cz < 8; ++cz)
                for (int cy = 0; cy < 8; ++cy)
                    for (int cx = 0; cx < 8; ++cx) {
                        float vals[8];
                        bool any_neg = false, any_pos = false, w_ok = true;
                        for (int c = 0; c < 8; ++c) {
                            int x = cx + (c & 1), y = cy + ((c >> 1) & 1),
                                z = cz + ((c >> 2) & 1);
                            vals[c] = ext_sdf[x][y][z];
                            any_neg |= vals[c] < 0;
                            any_pos |= vals[c] >= 0;
                            w_ok &= ext_w[x][y][z] > 0;
                        }
                        if (!any_neg || !any_pos) continue;
                        if (require_weight && !w_ok) continue;

                        if (algo == 1) {
                            int mask = 0;
                            for (int c = 0; c < 8; ++c)
                                if (vals[c] < 0) mask |= 1 << c;
                            const int8_t *tl = mc_tri + mask * 3 * MC_MAX_TRIS;
                            float ep[12][3], ec[12][3];
                            bool have[12] = {};
                            for (int i = 0; i < 3 * MC_MAX_TRIS && tl[i] >= 0; ++i) {
                                int e = tl[i];
                                if (!have[e]) {
                                    have[e] = true;
                                    int a = MC_EDGES.c[e][0], bb = MC_EDGES.c[e][1];
                                    float sa = vals[a], sb2 = vals[bb];
                                    float den = sa - sb2;
                                    float t = sa / (std::fabs(den) < 1e-12f ? 1e-12f : den);
                                    t = t < 0 ? 0 : (t > 1 ? 1 : t);
                                    int ax = cx + (a & 1), ay = cy + ((a >> 1) & 1), az = cz + ((a >> 2) & 1);
                                    int bx2 = cx + (bb & 1), by2 = cy + ((bb >> 1) & 1), bz2 = cz + ((bb >> 2) & 1);
                                    ep[e][0] = basex + ax + t * (bx2 - ax);
                                    ep[e][1] = basey + ay + t * (by2 - ay);
                                    ep[e][2] = basez + az + t * (bz2 - az);
                                    for (int ch = 0; ch < 3; ++ch)
                                        ec[e][ch] = (ext_c[ax][ay][az][ch] +
                                                     t * (float(ext_c[bx2][by2][bz2][ch]) -
                                                          ext_c[ax][ay][az][ch])) / 255.0f;
                                }
                                lv.push_back(ep[e][0] * voxel_size);
                                lv.push_back(ep[e][1] * voxel_size);
                                lv.push_back(ep[e][2] * voxel_size);
                                lc.push_back(ec[e][0]);
                                lc.push_back(ec[e][1]);
                                lc.push_back(ec[e][2]);
                            }
                            continue;
                        }

                        for (auto &tet : TETS) {
                            int mask = 0;
                            for (int c = 0; c < 4; ++c)
                                if (vals[tet[c]] < 0) mask |= 1 << c;
                            if (TABLES.cases[mask][0][0] == -1) continue;
                            // edge intersection points
                            float ep[6][3], ec[6][3];
                            for (int e = 0; e < 6; ++e) {
                                int a = tet[TET_EDGES[e][0]], bb = tet[TET_EDGES[e][1]];
                                float sa = vals[a], sb2 = vals[bb];
                                float den = sa - sb2;
                                float t = sa / (std::fabs(den) < 1e-12f ? 1e-12f : den);
                                t = t < 0 ? 0 : (t > 1 ? 1 : t);
                                int ax = cx + (a & 1), ay = cy + ((a >> 1) & 1), az = cz + ((a >> 2) & 1);
                                int bx2 = cx + (bb & 1), by2 = cy + ((bb >> 1) & 1), bz2 = cz + ((bb >> 2) & 1);
                                ep[e][0] = basex + ax + t * (bx2 - ax);
                                ep[e][1] = basey + ay + t * (by2 - ay);
                                ep[e][2] = basez + az + t * (bz2 - az);
                                for (int ch = 0; ch < 3; ++ch)
                                    ec[e][ch] = (ext_c[ax][ay][az][ch] +
                                                 t * (float(ext_c[bx2][by2][bz2][ch]) -
                                                      ext_c[ax][ay][az][ch])) / 255.0f;
                            }
                            for (int k = 0; k < 2; ++k) {
                                const int *tri = TABLES.cases[mask][k];
                                if (tri[0] == -1) continue;
                                for (int v = 0; v < 3; ++v) {
                                    int e = tri[v];
                                    lv.push_back(ep[e][0] * voxel_size);
                                    lv.push_back(ep[e][1] * voxel_size);
                                    lv.push_back(ep[e][2] * voxel_size);
                                    lc.push_back(ec[e][0]);
                                    lc.push_back(ec[e][1]);
                                    lc.push_back(ec[e][2]);
                                }
                            }
                        }
                    }
        }
        // flush thread-local buffers
        int64_t nv = (int64_t)lv.size() / 3;
        int64_t at = cursor.fetch_add(nv);
        int64_t take = nv;
        if (at + take > max_verts) take = max_verts > at ? max_verts - at : 0;
        if (take > 0) {
            std::memcpy(out_verts + at * 3, lv.data(), take * 3 * sizeof(float));
            std::memcpy(out_cols + at * 3, lc.data(), take * 3 * sizeof(float));
        }
    }
    int64_t total = cursor.load();
    return total > max_verts ? max_verts : total;
}

}  // extern "C"
