// Software triangle rasterizer for headless mujoco scene rendering.
//
// This host has mujoco (physics) but no GL stack (no libGL/EGL/OSMesa), so
// mujoco's own Renderer cannot produce the image observations our
// image-conditioned policies need. This ~200-line z-buffer rasterizer fills
// that hole: the Python side (envs/render3d.py) extracts the scene's
// triangle soup from mjModel/mjData and transforms vertices into a
// render-space camera frame (+z forward, +y down); this library clips
// against the near plane, projects, and scan-fills with flat per-face
// Lambert shading into an HWC uint8 buffer.
//
// Counterpart of the reference's OffScreenRenderEnv GPU rendering
// (env/libero/envs/env_wrapper.py) — re-done as a from-scratch software
// renderer because TPU hosts commonly lack a GL stack.
//
// Build: g++ -O2 -shared -fPIC -std=c++17 raster3d.cpp -o libraster3d.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

struct V3 {
    float x, y, z;
};

inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline V3 cross(V3 a, V3 b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
            a.x * b.y - a.y * b.x};
}
inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }

// Rasterize one camera-space triangle (already near-clipped: all z >= znear).
void fill_tri(const V3* v, const float* rgb_f, int H, int W, float fx,
              float fy, float cx, float cy, uint8_t* rgb, float* zbuf) {
    // project; keep 1/z for a perspective-correct depth test
    float px[3], py[3], iz[3];
    for (int i = 0; i < 3; ++i) {
        iz[i] = 1.0f / v[i].z;
        px[i] = cx + fx * v[i].x * iz[i];
        py[i] = cy + fy * v[i].y * iz[i];
    }
    float minx = std::floor(std::min({px[0], px[1], px[2]}));
    float maxx = std::ceil(std::max({px[0], px[1], px[2]}));
    float miny = std::floor(std::min({py[0], py[1], py[2]}));
    float maxy = std::ceil(std::max({py[0], py[1], py[2]}));
    int x0 = std::max(0, (int)minx), x1 = std::min(W - 1, (int)maxx);
    int y0 = std::max(0, (int)miny), y1 = std::min(H - 1, (int)maxy);
    if (x0 > x1 || y0 > y1) return;

    // signed area (screen space); render two-sided, skip degenerate
    float ax = px[1] - px[0], ay = py[1] - py[0];
    float bx = px[2] - px[0], by = py[2] - py[0];
    float area = ax * by - ay * bx;
    if (std::fabs(area) < 1e-9f) return;
    float inv_area = 1.0f / area;

    uint8_t r8 = (uint8_t)(std::min(std::max(rgb_f[0], 0.0f), 1.0f) * 255.0f);
    uint8_t g8 = (uint8_t)(std::min(std::max(rgb_f[1], 0.0f), 1.0f) * 255.0f);
    uint8_t b8 = (uint8_t)(std::min(std::max(rgb_f[2], 0.0f), 1.0f) * 255.0f);

    for (int y = y0; y <= y1; ++y) {
        float pyc = y + 0.5f;
        for (int x = x0; x <= x1; ++x) {
            float pxc = x + 0.5f;
            // barycentric via edge functions (normalized by signed area so
            // inside-ness is sign-consistent for both windings)
            float w0 = ((px[1] - pxc) * (py[2] - pyc) -
                        (py[1] - pyc) * (px[2] - pxc)) * inv_area;
            float w1 = ((px[2] - pxc) * (py[0] - pyc) -
                        (py[2] - pyc) * (px[0] - pxc)) * inv_area;
            float w2 = 1.0f - w0 - w1;
            if (w0 < 0.0f || w1 < 0.0f || w2 < 0.0f) continue;
            // 1/z interpolates linearly in screen space
            float z_inv = w0 * iz[0] + w1 * iz[1] + w2 * iz[2];
            float depth = 1.0f / z_inv;
            float* zp = zbuf + (size_t)y * W + x;
            if (depth >= *zp) continue;
            *zp = depth;
            uint8_t* px8 = rgb + ((size_t)y * W + x) * 3;
            px8[0] = r8;
            px8[1] = g8;
            px8[2] = b8;
        }
    }
}

}  // namespace

extern "C" {

// cam_xyz: [nv,3] float32 camera-space vertices (+z forward, +y down).
// faces: [nt,3] int32. face_rgb: [nt,3] float32 base color in [0,1].
// light_dir: len-3 unit vector (render space). Shading is two-sided
// Lambert: ambient + diffuse * |n . l|.
// rgb: [H,W,3] uint8 output. zbuf: [H,W] float32 scratch (caller-alloc).
void uva_raster3d(const float* cam_xyz, int32_t nv, const int32_t* faces,
                  const float* face_rgb, int32_t nt, int32_t H, int32_t W,
                  float fx, float fy, float cx, float cy, float znear,
                  const float* light_dir, float ambient, float diffuse,
                  const uint8_t* bg_rgb, uint8_t* rgb, float* zbuf) {
    const size_t npix = (size_t)H * W;
    for (size_t i = 0; i < npix; ++i) {
        rgb[i * 3 + 0] = bg_rgb[0];
        rgb[i * 3 + 1] = bg_rgb[1];
        rgb[i * 3 + 2] = bg_rgb[2];
        zbuf[i] = 3.4e38f;
    }
    V3 light = {light_dir[0], light_dir[1], light_dir[2]};

    for (int32_t t = 0; t < nt; ++t) {
        V3 tri[3];
        bool oob = false;
        for (int i = 0; i < 3; ++i) {
            int32_t vi = faces[t * 3 + i];
            if (vi < 0 || vi >= nv) {
                oob = true;
                break;
            }
            const float* p = cam_xyz + (size_t)vi * 3;
            tri[i] = {p[0], p[1], p[2]};
        }
        if (oob) continue;

        // flat shade from the camera-space face normal
        V3 n = cross(sub(tri[1], tri[0]), sub(tri[2], tri[0]));
        float nl = std::sqrt(dot(n, n));
        float shade = ambient;
        if (nl > 1e-12f)
            shade += diffuse * std::fabs(dot(n, light) / nl);
        float col[3] = {face_rgb[t * 3 + 0] * shade,
                        face_rgb[t * 3 + 1] * shade,
                        face_rgb[t * 3 + 2] * shade};

        // clip against z = znear (Sutherland-Hodgman on one plane).
        // Result is a convex polygon with 0..4 vertices; fan-triangulate.
        V3 poly[4];
        int np = 0;
        for (int i = 0; i < 3; ++i) {
            V3 a = tri[i], b = tri[(i + 1) % 3];
            bool ain = a.z >= znear, bin = b.z >= znear;
            if (ain) poly[np++] = a;
            if (ain != bin) {
                float s = (znear - a.z) / (b.z - a.z);
                poly[np++] = {a.x + s * (b.x - a.x), a.y + s * (b.y - a.y),
                              znear};
            }
        }
        for (int i = 2; i < np; ++i) {
            V3 fan[3] = {poly[0], poly[i - 1], poly[i]};
            fill_tri(fan, col, H, W, fx, fy, cx, cy, rgb, zbuf);
        }
    }
}

}  // extern "C"
