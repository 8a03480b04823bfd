// Software triangle rasterizer for the synthetic-data renderer.
//
// Replaces the reference's pyrender/EGL GPU offscreen renderer
// (latentfusion/rendering.py) with a host-side native renderer: the TPU has
// no GL, and the synthesis pipeline runs in host worker processes feeding
// the device (SURVEY.md §2.11 "Dataset/render offload").
//
// Model: pinhole intrinsics, object->camera extrinsic (OpenCV convention,
// +z forward), z-buffer, barycentric interpolation, Blinn-Phong shading
// (Lambertian diffuse + roughness-controlled specular lobe, approximating
// the reference's metallic-roughness PBR materials with MERL-sampled
// roughness, reference: datasets/training/pyrender.py:232-250) with
// ambient + point lights (intensity / d^2 falloff, matching pyrender's
// PointLight), optional UV-mapped texture albedo (with the reference's
// UV-rescale), no backface culling (reference uses SKIP_CULL_FACES).
//
// Build: make -C native   (produces librasterizer.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

struct Vec3 {
    float x, y, z;
};

inline Vec3 sub(const Vec3& a, const Vec3& b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline Vec3 cross(const Vec3& a, const Vec3& b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline float dot(const Vec3& a, const Vec3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline Vec3 normalize(const Vec3& v) {
    float n = std::sqrt(dot(v, v)) + 1e-12f;
    return {v.x / n, v.y / n, v.z / n};
}

}  // namespace

extern "C" {

// All matrices row-major. extrinsic: 4x4 object->camera. intrinsic: 3x3.
// vertex_colors / vertex_normals may be null (defaults: albedo 0.8,
// computed face normals). light_* may be null (n_lights = 0).
// uvs (n_vertices * 2) + texture (tex_h * tex_w * 3, [0,1] rgb) enable
// UV-mapped albedo (bilinear, wrap); uv_scale rescales the UVs (the
// reference's random texture-scale augmentation). specular = Blinn-Phong
// ks; shininess = exponent (derive from roughness as 2/r^4 - 2).
// out_color: H*W*3 (unshaded albedo written when shade == 0),
// out_depth: H*W (0 where no geometry).
void rasterize(const float* vertices, int n_vertices,
               const int32_t* faces, int n_faces,
               const float* vertex_colors,
               const float* vertex_normals,
               const float* uvs,
               const float* texture, int tex_w, int tex_h,
               float uv_scale,
               const float* extrinsic,
               const float* intrinsic,
               int width, int height,
               const float* light_pos,    // (L, 3) object space
               const float* light_color,  // (L, 3)
               const float* light_intensity,  // (L,)
               int n_lights,
               float ambient,
               float specular,
               float shininess,
               int shade,
               float* out_color,
               float* out_depth) {
    const float fx = intrinsic[0], cx = intrinsic[2];
    const float fy = intrinsic[4], cy = intrinsic[5];
    const bool use_texture = uvs != nullptr && texture != nullptr &&
                             tex_w > 0 && tex_h > 0;

    // Camera center in object space: C = -R^T t (for the specular half
    // vector).
    Vec3 cam_center = {0.f, 0.f, 0.f};
    {
        const float tx = extrinsic[3], ty = extrinsic[7], tz = extrinsic[11];
        cam_center = {
            -(extrinsic[0] * tx + extrinsic[4] * ty + extrinsic[8] * tz),
            -(extrinsic[1] * tx + extrinsic[5] * ty + extrinsic[9] * tz),
            -(extrinsic[2] * tx + extrinsic[6] * ty + extrinsic[10] * tz)};
    }

    std::fill(out_depth, out_depth + width * height, 0.0f);
    std::fill(out_color, out_color + width * height * 3, 0.0f);

    // Transform vertices to camera space.
    float* cam = new float[n_vertices * 3];
    for (int i = 0; i < n_vertices; ++i) {
        const float* v = vertices + 3 * i;
        for (int r = 0; r < 3; ++r) {
            cam[3 * i + r] = extrinsic[4 * r + 0] * v[0] + extrinsic[4 * r + 1] * v[1] +
                             extrinsic[4 * r + 2] * v[2] + extrinsic[4 * r + 3];
        }
    }

    // Project to pixel coordinates.
    float* px = new float[n_vertices * 2];
    for (int i = 0; i < n_vertices; ++i) {
        float z = std::max(cam[3 * i + 2], 1e-6f);
        px[2 * i + 0] = fx * cam[3 * i + 0] / z + cx;
        px[2 * i + 1] = fy * cam[3 * i + 1] / z + cy;
    }

    const float znear = 1e-4f;

    // Deferred shading: pass 1 resolves visibility only (z-buffer + winning
    // triangle id + perspective-correct barycentrics), pass 2 shades each
    // covered pixel exactly once. Forward shading paid the full texture +
    // multi-light cost per *fragment*; with typical overdraw factors of
    // 1.5-3x on closed meshes that dominated render time.
    const int n_px = width * height;
    int32_t* tri_id = new int32_t[n_px];
    float* bary = new float[n_px * 2];
    std::fill(tri_id, tri_id + n_px, -1);

    for (int t = 0; t < n_faces; ++t) {
        const int32_t i0 = faces[3 * t], i1 = faces[3 * t + 1], i2 = faces[3 * t + 2];
        const float z0 = cam[3 * i0 + 2], z1 = cam[3 * i1 + 2], z2 = cam[3 * i2 + 2];
        if (z0 <= znear || z1 <= znear || z2 <= znear) continue;  // clip

        const float x0 = px[2 * i0], y0 = px[2 * i0 + 1];
        const float x1 = px[2 * i1], y1 = px[2 * i1 + 1];
        const float x2 = px[2 * i2], y2 = px[2 * i2 + 1];

        int xmin = std::max(0, (int)std::floor(std::min({x0, x1, x2})));
        int xmax = std::min(width - 1, (int)std::ceil(std::max({x0, x1, x2})));
        int ymin = std::max(0, (int)std::floor(std::min({y0, y1, y2})));
        int ymax = std::min(height - 1, (int)std::ceil(std::max({y0, y1, y2})));
        if (xmin > xmax || ymin > ymax) continue;

        const float denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2);
        if (std::fabs(denom) < 1e-12f) continue;
        const float inv_denom = 1.0f / denom;

        // Perspective-correct interpolation uses 1/z weights.
        const float iz0 = 1.0f / z0, iz1 = 1.0f / z1, iz2 = 1.0f / z2;

        for (int y = ymin; y <= ymax; ++y) {
            const float fy_ = y + 0.0f;
            for (int x = xmin; x <= xmax; ++x) {
                const float fx_ = x + 0.0f;
                float w0 = ((y1 - y2) * (fx_ - x2) + (x2 - x1) * (fy_ - y2)) * inv_denom;
                float w1 = ((y2 - y0) * (fx_ - x2) + (x0 - x2) * (fy_ - y2)) * inv_denom;
                float w2 = 1.0f - w0 - w1;
                if (w0 < 0 || w1 < 0 || w2 < 0) continue;

                // Perspective-correct barycentrics.
                float izp = w0 * iz0 + w1 * iz1 + w2 * iz2;
                float z = 1.0f / izp;
                const int idx = y * width + x;
                float* dst = out_depth + idx;
                if (*dst != 0.0f && z >= *dst) continue;
                *dst = z;
                tri_id[idx] = t;
                bary[2 * idx] = w0 * iz0 * z;
                bary[2 * idx + 1] = w1 * iz1 * z;
            }
        }
    }

    // Shading is embarrassingly parallel over pixels (disjoint writes, so
    // the output is bit-identical at any thread count). Default 1 thread:
    // the loader already parallelizes across worker *processes*; set
    // RASTERIZER_THREADS>1 only when a single renderer owns the host
    // (e.g. interactive evaluation).
    int n_threads = 1;
    if (const char* env = std::getenv("RASTERIZER_THREADS")) {
        n_threads = std::max(1, std::min(64, atoi(env)));
    }

    auto shade_range = [&](int idx_begin, int idx_end) {
    for (int idx = idx_begin; idx < idx_end; ++idx) {
        const int32_t t = tri_id[idx];
        if (t < 0) continue;
        const int32_t i0 = faces[3 * t], i1 = faces[3 * t + 1], i2 = faces[3 * t + 2];
        const float b0 = bary[2 * idx], b1 = bary[2 * idx + 1];
        const float b2 = 1.0f - b0 - b1;
        {
                float albedo[3] = {0.8f, 0.8f, 0.8f};
                if (use_texture) {
                    // Perspective-correct UV, rescaled then wrapped
                    // (reference rescales UVs into [0, scale] and tiles).
                    float u = (b0 * uvs[2 * i0] + b1 * uvs[2 * i1] +
                               b2 * uvs[2 * i2]) * uv_scale;
                    float v = (b0 * uvs[2 * i0 + 1] + b1 * uvs[2 * i1 + 1] +
                               b2 * uvs[2 * i2 + 1]) * uv_scale;
                    u -= std::floor(u);
                    v -= std::floor(v);
                    // Bilinear tap with wrap addressing; v flipped (image
                    // row 0 = top, UV v = 0 = bottom, GL convention).
                    float tu = u * tex_w - 0.5f;
                    float tv = (1.0f - v) * tex_h - 0.5f;
                    int u0i = (int)std::floor(tu), v0i = (int)std::floor(tv);
                    float wu = tu - u0i, wv = tv - v0i;
                    auto wrap = [](int i, int n) {
                        i %= n;
                        return i < 0 ? i + n : i;
                    };
                    int u1i = wrap(u0i + 1, tex_w), v1i = wrap(v0i + 1, tex_h);
                    u0i = wrap(u0i, tex_w);
                    v0i = wrap(v0i, tex_h);
                    for (int c = 0; c < 3; ++c) {
                        float t00 = texture[3 * (v0i * tex_w + u0i) + c];
                        float t01 = texture[3 * (v0i * tex_w + u1i) + c];
                        float t10 = texture[3 * (v1i * tex_w + u0i) + c];
                        float t11 = texture[3 * (v1i * tex_w + u1i) + c];
                        albedo[c] = (1 - wv) * ((1 - wu) * t00 + wu * t01) +
                                    wv * ((1 - wu) * t10 + wu * t11);
                    }
                    if (vertex_colors) {
                        for (int c = 0; c < 3; ++c)
                            albedo[c] *= b0 * vertex_colors[3 * i0 + c] +
                                         b1 * vertex_colors[3 * i1 + c] +
                                         b2 * vertex_colors[3 * i2 + c];
                    }
                } else if (vertex_colors) {
                    for (int c = 0; c < 3; ++c)
                        albedo[c] = b0 * vertex_colors[3 * i0 + c] +
                                    b1 * vertex_colors[3 * i1 + c] +
                                    b2 * vertex_colors[3 * i2 + c];
                }

                float* col = out_color + 3 * idx;
                if (!shade) {
                    col[0] = albedo[0];
                    col[1] = albedo[1];
                    col[2] = albedo[2];
                    continue;
                }

                // Object-space position + normal at the fragment.
                Vec3 p = {
                    b0 * vertices[3 * i0] + b1 * vertices[3 * i1] + b2 * vertices[3 * i2],
                    b0 * vertices[3 * i0 + 1] + b1 * vertices[3 * i1 + 1] + b2 * vertices[3 * i2 + 1],
                    b0 * vertices[3 * i0 + 2] + b1 * vertices[3 * i1 + 2] + b2 * vertices[3 * i2 + 2]};
                Vec3 n;
                if (vertex_normals) {
                    n = normalize({
                        b0 * vertex_normals[3 * i0] + b1 * vertex_normals[3 * i1] + b2 * vertex_normals[3 * i2],
                        b0 * vertex_normals[3 * i0 + 1] + b1 * vertex_normals[3 * i1 + 1] + b2 * vertex_normals[3 * i2 + 1],
                        b0 * vertex_normals[3 * i0 + 2] + b1 * vertex_normals[3 * i1 + 2] + b2 * vertex_normals[3 * i2 + 2]});
                } else {
                    Vec3 a = {vertices[3 * i0], vertices[3 * i0 + 1], vertices[3 * i0 + 2]};
                    Vec3 b = {vertices[3 * i1], vertices[3 * i1 + 1], vertices[3 * i1 + 2]};
                    Vec3 c = {vertices[3 * i2], vertices[3 * i2 + 1], vertices[3 * i2 + 2]};
                    n = normalize(cross(sub(b, a), sub(c, a)));
                }

                float shade_rgb[3] = {ambient, ambient, ambient};
                float spec_rgb[3] = {0.f, 0.f, 0.f};
                Vec3 vdir = normalize(sub(cam_center, p));
                for (int l = 0; l < n_lights; ++l) {
                    Vec3 lp = {light_pos[3 * l], light_pos[3 * l + 1], light_pos[3 * l + 2]};
                    Vec3 ldir = sub(lp, p);
                    float d2 = dot(ldir, ldir) + 1e-9f;
                    ldir = normalize(ldir);
                    float lambert = std::fabs(dot(n, ldir));  // two-sided
                    float atten = light_intensity[l] / d2;
                    for (int c = 0; c < 3; ++c)
                        shade_rgb[c] += lambert * atten * light_color[3 * l + c];
                    if (specular > 0.0f) {
                        // Blinn-Phong half-vector lobe; two-sided normal to
                        // match the diffuse term.
                        Vec3 h = normalize({ldir.x + vdir.x, ldir.y + vdir.y,
                                            ldir.z + vdir.z});
                        float nh = std::fabs(dot(n, h));
                        float lobe = std::pow(nh, shininess);
                        for (int c = 0; c < 3; ++c)
                            spec_rgb[c] += specular * lobe * atten *
                                           light_color[3 * l + c];
                    }
                }
                for (int c = 0; c < 3; ++c)
                    col[c] = std::min(1.0f, albedo[c] * shade_rgb[c] + spec_rgb[c]);
        }
    }
    };

    if (n_threads <= 1) {
        shade_range(0, n_px);
    } else {
        std::vector<std::thread> pool;
        const int chunk = (n_px + n_threads - 1) / n_threads;
        for (int t = 0; t < n_threads; ++t) {
            const int begin = t * chunk;
            const int end = std::min(n_px, begin + chunk);
            if (begin < end) pool.emplace_back(shade_range, begin, end);
        }
        for (auto& th : pool) th.join();
    }

    delete[] tri_id;
    delete[] bary;
    delete[] cam;
    delete[] px;
}

}  // extern "C"
