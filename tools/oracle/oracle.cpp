// zoic-tpu golden-value oracle.
//
// A standalone, dependency-free C++ re-implementation of the reference
// camera math (zpelgrims/zoic, src/zoic.cpp) used ONLY to generate golden
// test vectors for the JAX framework.  This is written from the survey of
// the reference's behavior (SURVEY.md §2, C4-C18) — float32 storage with
// C++ double promotion in expressions, matching the reference's precision
// class — not copied from it (no Arnold SDK, different structure, JSON out).
//
// Subcommands (all emit JSON on stdout):
//   solve    <lens.dat> <focal_cm> <fstop> <focus_cm>
//   trace    <lens.dat> <focal_cm> <fstop> <focus_cm> <n>   (rays on stdin)
//   tracelut <lens.dat> <focal_cm> <fstop> <focus_cm> <n_film> <n_samp> <n>
//            (2*n_film*n_samp LUT-build uniforms then n rays on stdin)
//   thinlens <sw> <sh> <focal_cm> <fstop> <focus_cm> <ovd> <ovr> <n>
//   bokeh    <w> <h> <n>    (w*h*3 floats then 2n uniforms on stdin)
//
// trace/thinlens read n lines of "sx sy u v" from stdin and report the
// FIRST-ATTEMPT result only (no RNG retries -> deterministic comparisons).

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Vec3 {
    float x = 0, y = 0, z = 0;
};

Vec3 operator-(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
Vec3 operator+(Vec3 a, Vec3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
Vec3 operator*(Vec3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
float dot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
Vec3 normalize(Vec3 a) {
    float inv = 1.0f / std::sqrt(dot(a, a));
    return a * inv;
}

constexpr float kPi = 3.14159265358979323f;

// Bhaskara-style sine approximation (reference zoic.cpp:661-668 semantics).
float fast_sin(float x) {
    x = std::fmod(x + kPi, kPi * 2) - kPi;
    const float b = 4.0f / kPi;
    const float c = -4.0f / (kPi * kPi);
    float y = b * x + c * x * std::abs(x);
    const float p = 0.225f;
    return p * (y * std::abs(y) - y) + y;
}
float fast_cos(float x) { return fast_sin(x + kPi * 0.5f); }

// Shirley/Cline concentric square->disk map (zoic.cpp:686-704 semantics).
void concentric_disk(float ox, float oy, float *lx, float *ly) {
    float a = 2.0f * ox - 1.0f;
    float b = 2.0f * oy - 1.0f;
    float r, phi;
    if (a * a > b * b) {
        r = a;
        phi = 0.78539816339f * (b / a);
    } else {
        r = b;
        if (b == 0.0f) {
            *lx = 0.0f;
            *ly = 0.0f;
            return;
        }
        phi = (kPi / 2.0f) - 0.78539816339f * (a / b);
    }
    *lx = r * fast_cos(phi);
    *ly = r * fast_sin(phi);
}

// Signed-radius sphere intersection with optional near-solution and
// real-ray miss culling (zoic.cpp:973-995 semantics).
bool sphere_isect(Vec3 *hit, Vec3 dir, Vec3 origin, Vec3 center, float radius,
                  bool reverse, bool real_rays) {
    dir = normalize(dir);
    Vec3 L = center - origin;
    float tca = dot(L, dir);
    float r2 = radius * radius;
    float d2 = dot(L, L) - tca * tca;
    if (real_rays && d2 > r2) return false;
    float thc = std::sqrt(std::abs(r2 - d2));
    float sign = radius < 0.0f ? -1.0f : 1.0f;
    float t = reverse ? tca - thc * sign : tca + thc * sign;
    *hit = origin + dir * t;
    return true;
}

Vec3 sphere_normal(Vec3 hit, Vec3 center, float radius) {
    float sign = radius < 0.0f ? -1.0f : 1.0f;
    return normalize(center - hit) * sign;
}

// Snell with TIR flagged only for real rays when entering a rarer medium
// (zoic.cpp:1008-1025 semantics).
bool snell(Vec3 *out, float n1, float n2, Vec3 incident, Vec3 normal,
           bool real_rays) {
    incident = normalize(incident);
    normal = normalize(normal);
    float eta = n2 == 1.0f ? n1 : n1 / n2;
    float c1 = -dot(incident, normal);
    float cs2 = (eta * eta) * (1.0f - c1 * c1);
    if (real_rays && n1 > n2 && cs2 > 1.0f) return false;
    *out = (incident * eta) + normal * ((eta * c1) - std::sqrt(std::abs(1.0f - cs2)));
    return true;
}

// y = 0 plane crossing (zoic.cpp:1043-1049 reduces to this).
Vec3 plane_y0(Vec3 origin, Vec3 dir) {
    dir = normalize(dir);
    return origin + dir * ((0.0f - origin.y) / dir.y);
}

// (z, y)-plane line-line crossing through two point pairs
// (zoic.cpp:1029-1039 semantics); returns the z coordinate.
float line_line_z(Vec3 p1, Vec3 p2, Vec3 p3, Vec3 p4) {
    float a1 = p2.y - p1.y, b1 = p1.z - p2.z;
    float c1 = a1 * p1.z + b1 * p1.y;
    float a2 = p4.y - p3.y, b2 = p3.z - p4.z;
    float c2 = a2 * p3.z + b2 * p3.y;
    float delta = a1 * b2 - a2 * b1;
    return (b2 * c1 - b1 * c2) / delta;
}

struct Lens {
    std::vector<float> curv, thick, ior, abbe, ap;
    int aperture_element = -1;
    int count() const { return (int)curv.size(); }
};

// Tokenizing parser for 4/5-column tabular data, '#' comments, element
// order reversed to rear-first (zoic.cpp:708-914 behavior).
Lens parse_lens(const std::string &path) {
    std::ifstream f(path);
    if (!f) {
        std::fprintf(stderr, "cannot open %s\n", path.c_str());
        std::exit(2);
    }
    std::vector<std::vector<float>> rows;
    std::string line;
    long tokens_total = 0;
    while (std::getline(f, line)) {
        if (line.empty() || line[0] == '#') continue;
        std::vector<float> row;
        std::string tok;
        std::stringstream ss(line);
        // reference splits on any of "\t,;: "
        std::string cur;
        for (char ch : line) {
            if (ch == '\t' || ch == ',' || ch == ';' || ch == ':' || ch == ' ') {
                if (!cur.empty()) { row.push_back(std::stof(cur)); cur.clear(); }
            } else cur.push_back(ch);
        }
        if (!cur.empty()) row.push_back(std::stof(cur));
        if (row.empty()) continue;
        tokens_total += (long)row.size();
        rows.push_back(row);
    }
    int cols = (int)((float)tokens_total / (float)rows.size());
    Lens ld;
    for (auto &r : rows) {
        ld.curv.push_back(r[0]);
        ld.thick.push_back(r[1]);
        ld.ior.push_back(r[2]);
        ld.abbe.push_back(cols == 5 ? r[3] : 0.0f);
        ld.ap.push_back(cols == 5 ? r[4] : r[3]);
    }
    std::reverse(ld.curv.begin(), ld.curv.end());
    std::reverse(ld.thick.begin(), ld.thick.end());
    std::reverse(ld.ior.begin(), ld.ior.end());
    std::reverse(ld.abbe.begin(), ld.abbe.end());
    std::reverse(ld.ap.begin(), ld.ap.end());
    return ld;
}

// Aperture find/flatten, air IOR fix, mm->cm, rear shift
// (zoic.cpp:917-959 behavior).
void cleanup(Lens *ld) {
    for (int i = 0; i < ld->count(); i++) {
        if (ld->curv[i] == 0.0f) {
            ld->aperture_element = i;
            ld->curv[i] = 99999.0f;
        }
        if (ld->ior[i] == 0.0f) ld->ior[i] = 1.0f;
    }
    for (int i = 0; i < ld->count(); i++) {
        ld->curv[i] *= 0.1f;
        ld->thick[i] *= 0.1f;
        ld->ap[i] *= 0.1f;
    }
    float summed = 0.0f;
    for (int i = 0; i < ld->count(); i++) summed += ld->thick[i];
    ld->thick[0] -= summed;
}

struct FocalOut {
    float focal, pp, fp;
};

// Near-axis parallel probe -> principal plane + focal point
// (zoic.cpp:1161-1228 behavior).
FocalOut trace_focal(Lens *ld) {
    int e = ld->count();
    float h = ld->ap[0] * 0.1f;
    Vec3 origin{0.0f, h, 0.0f};
    Vec3 dir{0.0f, 0.0f, 99999.0f};
    float summed = 0.0f, pp = 0.0f, fp = 0.0f;
    for (int i = 0; i < e; i++) {
        summed += ld->thick[i];
        Vec3 center{0.0f, 0.0f, summed - ld->curv[i]};
        Vec3 hit;
        sphere_isect(&hit, dir, origin, center, ld->curv[i], false, false);
        Vec3 n = sphere_normal(hit, center, ld->curv[i]);
        float n2 = i == e - 1 ? 1.0f : ld->ior[i + 1];
        Vec3 d2;
        if (snell(&d2, ld->ior[i], n2, dir, n, true)) dir = d2;
        if (i == e - 1) {
            Vec3 l1s{0.0f, h, 0.0f}, l1e{0.0f, h, 999999.0f};
            Vec3 l2e{0.0f, (float)(origin.y + dir.y * 100000.0),
                     (float)(origin.z + dir.z * 100000.0)};
            pp = line_line_z(l1s, l1e, origin, l2e);
            fp = plane_y0(origin, dir).z;
        }
        origin = hit;
    }
    return {fp - pp, pp, fp};
}

// Backwards focus trace -> film-plane z (zoic.cpp:1054-1095 behavior).
float image_distance(Lens *ld, float object_distance) {
    int e = ld->count();
    Vec3 origin{0.0f, 0.0f, object_distance};
    Vec3 dir{0.0f, (ld->ap[e - 1] / 2.0f) * 0.05f, -object_distance};
    // Same conditioning identity as solve.py image_distance: advance the
    // origin along the (unchanged) ray line to z ~ 1 so float32 positions
    // stay O(1) regardless of the focus distance.
    {
        Vec3 dn = normalize(dir);
        float t0 = (1.0f - origin.z) / dn.z;
        if (t0 < 0.0f) t0 = 0.0f;
        origin = origin + dn * t0;
    }
    float summed = 0.0f;
    for (int i = 0; i < e; i++) summed += ld->thick[i];
    float img = 0.0f;
    for (int i = 0; i < e; i++) {
        if (i != 0) summed -= ld->thick[e - i];
        int j = e - 1 - i;
        Vec3 center{0.0f, 0.0f, summed - ld->curv[j]};
        Vec3 hit;
        sphere_isect(&hit, dir, origin, center, ld->curv[j], true, false);
        Vec3 n = sphere_normal(hit, center, -ld->curv[j]);
        float n1 = i == 0 ? 1.0f : ld->ior[e - i];
        Vec3 d2;
        snell(&d2, n1, ld->ior[j], dir, n, false);
        dir = d2;
        if (i == e - 1) img = plane_y0(hit, dir).z;
        origin = hit;
    }
    return img;
}

struct Solved {
    Lens ld;
    float ratio, user_ap, origin_shift, ap_dist, focal2;
    FocalOut t1, t2;
};

// Full node_update pipeline for the raytraced model
// (zoic.cpp:1615-1698 behavior, minus the Monte-Carlo LUT).
Solved solve(const std::string &path, float focal, float fstop, float focus) {
    Solved s;
    s.ld = parse_lens(path);
    cleanup(&s.ld);
    s.t1 = trace_focal(&s.ld);
    s.ratio = focal / s.t1.focal;
    for (int i = 0; i < s.ld.count(); i++) {
        s.ld.curv[i] *= s.ratio;
        s.ld.thick[i] *= s.ratio;
        s.ld.ap[i] *= s.ratio;
    }
    s.t2 = trace_focal(&s.ld);
    s.focal2 = s.t2.focal;
    s.user_ap = s.focal2 / (2.0f * fstop);
    if (s.ld.aperture_element >= 0 &&
        s.user_ap > s.ld.ap[s.ld.aperture_element])
        s.user_ap = s.ld.ap[s.ld.aperture_element];
    s.origin_shift = image_distance(&s.ld, focus);
    s.ap_dist = 0.0f;
    for (int i = 0; i < s.ld.count(); i++) {
        s.ap_dist += s.ld.thick[i];
        if (i == s.ld.aperture_element) break;
    }
    return s;
}

// Rear-to-front element stack trace with aperture culls + TIR
// (zoic.cpp:1099-1158 behavior).  Centers via running thickness sum
// (equivalent to computeLensCenters).
bool trace_stack(Solved *s, Vec3 *origin, Vec3 *dir) {
    float summed = 0.0f;
    for (int i = 0; i < s->ld.count(); i++) {
        summed += s->ld.thick[i];
        Vec3 center{0.0f, 0.0f, summed - s->ld.curv[i]};
        Vec3 hit;
        if (!sphere_isect(&hit, *dir, *origin, center, s->ld.curv[i], false, true))
            return false;
        float h2 = hit.x * hit.x + hit.y * hit.y;
        if (h2 > (s->ld.ap[i] * 0.5) * (s->ld.ap[i] * 0.5)) return false;
        if (i == s->ld.aperture_element && h2 > s->user_ap * s->user_ap)
            return false;
        Vec3 n = sphere_normal(hit, center, s->ld.curv[i]);
        *origin = hit;
        float n2 = i == s->ld.count() - 1 ? 1.0f : s->ld.ior[i + 1];
        Vec3 d2;
        if (!snell(&d2, s->ld.ior[i], n2, *dir, n, true)) return false;
        *dir = d2;
    }
    return true;
}

void emit_vec(const char *name, Vec3 v, bool comma = true) {
    std::printf("\"%s\":[%.9g,%.9g,%.9g]%s", name, v.x, v.y, v.z,
                comma ? "," : "");
}

int cmd_solve(int argc, char **argv) {
    Solved s = solve(argv[2], std::strtof(argv[3], nullptr),
                     std::strtof(argv[4], nullptr), std::strtof(argv[5], nullptr));
    std::printf("{\"count\":%d,\"aperture_element\":%d,", s.ld.count(),
                s.ld.aperture_element);
    std::printf("\"focal_raw\":%.9g,\"pp_raw\":%.9g,\"fp_raw\":%.9g,",
                s.t1.focal, s.t1.pp, s.t1.fp);
    std::printf("\"ratio\":%.9g,\"focal\":%.9g,\"pp\":%.9g,\"fp\":%.9g,",
                s.ratio, s.t2.focal, s.t2.pp, s.t2.fp);
    std::printf("\"user_aperture_radius\":%.9g,\"origin_shift\":%.9g,"
                "\"aperture_distance\":%.9g,",
                s.user_ap, s.origin_shift, s.ap_dist);
    auto arr = [](const char *n, const std::vector<float> &v, bool comma) {
        std::printf("\"%s\":[", n);
        for (size_t i = 0; i < v.size(); i++)
            std::printf("%.9g%s", v[i], i + 1 < v.size() ? "," : "");
        std::printf("]%s", comma ? "," : "");
    };
    arr("curvature", s.ld.curv, true);
    arr("thickness", s.ld.thick, true);
    arr("ior", s.ld.ior, true);
    arr("aperture", s.ld.ap, false);
    std::printf("}\n");
    return 0;
}

// First-attempt raytraced rays, naive first-element targeting
// (zoic.cpp:1850-1887 behavior minus retries; LUT shaping is validated
// statistically on the Python side).
int cmd_trace(int argc, char **argv) {
    Solved s = solve(argv[2], std::strtof(argv[3], nullptr),
                     std::strtof(argv[4], nullptr), std::strtof(argv[5], nullptr));
    float sw = 3.6f;  // reference default sensorWidth
    int n = std::atoi(argv[6]);
    std::printf("{\"rays\":[");
    for (int k = 0; k < n; k++) {
        float sx, sy, u, v;
        if (std::scanf("%f %f %f %f", &sx, &sy, &u, &v) != 4) break;
        Vec3 origin{(float)(sx * (sw * 0.5)), (float)(sy * (sw * 0.5)),
                    s.origin_shift};
        float lx, ly;
        concentric_disk(u, v, &lx, &ly);
        Vec3 dir{lx * s.ld.ap[0] - origin.x, ly * s.ld.ap[0] - origin.y,
                 -s.ld.thick[0]};
        bool ok = trace_stack(&s, &origin, &dir);
        origin = origin * -1.0f;
        dir = dir * -1.0f;
        std::printf("{\"ok\":%s,", ok ? "true" : "false");
        emit_vec("origin", origin, true);
        emit_vec("dir", dir, false);
        std::printf("}%s", k + 1 < n ? "," : "");
    }
    std::printf("]}\n");
    return 0;
}

// Exit-pupil LUT build from caller-supplied uniforms + LUT-shaped
// first-attempt rays (zoic.cpp:1391-1452 build; 1889-1924 shaping: uniform
// key lower_bound + lerp of maxScale/centroid, x1.05 margin, rotation by
// the film azimuth with fastSin/fastCos).  The bound-ray uniform stream
// comes from stdin so the Python LUT build can consume the identical
// stream -> deterministic golden comparison of the whole LUT-shaped path.
int cmd_tracelut(int argc, char **argv) {
    Solved s = solve(argv[2], std::strtof(argv[3], nullptr),
                     std::strtof(argv[4], nullptr), std::strtof(argv[5], nullptr));
    int n_film = std::atoi(argv[6]);
    int n_samp = std::atoi(argv[7]);
    int n = std::atoi(argv[8]);
    const float sw = 3.6f;               // reference default sensorWidth
    const float film_width = 4.0f;       // hard-coded (zoic.cpp:1393)
    const float spacing = film_width / (float)n_film;

    std::vector<float> u0((size_t)n_film * n_samp), u1((size_t)n_film * n_samp);
    for (auto &x : u0)
        if (std::scanf("%f", &x) != 1) return 2;
    for (auto &x : u1)
        if (std::scanf("%f", &x) != 1) return 2;

    std::vector<float> max_scale(n_film), centroid(n_film);
    const float first_ap = s.ld.ap[0];
    const float first_thick = s.ld.thick[0];
    for (int i = 0; i < n_film; i++) {
        float key = (float)i * spacing;
        float mnx = 0, mny = 0, mxx = 0, mxy = 0;
        bool any = false;
        for (int k = 0; k < n_samp; k++) {
            float lu = u0[(size_t)i * n_samp + k] * 2.0f - 1.0f;
            float lv = u1[(size_t)i * n_samp + k] * 2.0f - 1.0f;
            Vec3 origin{key, 0.0f, s.origin_shift};
            // whole-first-element targeting via the element DIAMETER value
            // (zoic.cpp:1417 over-cover quirk, preserved on both sides)
            Vec3 dir{lu * first_ap - origin.x, lv * first_ap - origin.y,
                     -first_thick};
            if (!trace_stack(&s, &origin, &dir)) continue;
            float px = lu * first_ap, py = lv * first_ap;
            if (!any) {
                mnx = mxx = px;
                mny = mxy = py;
                any = true;
            } else {
                mnx = std::min(mnx, px);
                mny = std::min(mny, py);
                mxx = std::max(mxx, px);
                mxy = std::max(mxy, py);
            }
        }
        // empty film positions keep the zero bbox (zoic.cpp:1402-1404)
        float cx = (mnx + mxx) * 0.5f;
        float cy = (mny + mxy) * 0.5f;
        float sx_ = std::abs(mxx - cx);
        float sy_ = std::abs(mxy - cy);
        max_scale[i] = std::max(sx_, sy_);
        centroid[i] = cx;
    }

    std::printf("{\"max_scale\":[");
    for (int i = 0; i < n_film; i++)
        std::printf("%.9g%s", max_scale[i], i + 1 < n_film ? "," : "");
    std::printf("],\"centroid\":[");
    for (int i = 0; i < n_film; i++)
        std::printf("%.9g%s", centroid[i], i + 1 < n_film ? "," : "");
    std::printf("],\"rays\":[");
    for (int k = 0; k < n; k++) {
        float sx, sy, u, v;
        if (std::scanf("%f %f %f %f", &sx, &sy, &u, &v) != 4) break;
        Vec3 origin{(float)(sx * (sw * 0.5)), (float)(sy * (sw * 0.5)),
                    s.origin_shift};
        float dist = std::abs(std::sqrt(origin.x * origin.x + origin.y * origin.y));
        // uniform-key reduction of map::lower_bound + decrement + lerp
        // (zoic.cpp:1892-1911; percentage is 0 at the lower_bound key,
        // 1 at the previous key)
        int i_lb = (int)std::ceil(dist / spacing);
        if (i_lb < 0) i_lb = 0;
        if (i_lb > n_film - 1) i_lb = n_film - 1;
        int i_prev = i_lb > 0 ? i_lb - 1 : 0;
        float lower = (float)i_lb * spacing;
        float prevk = (float)i_prev * spacing;
        float denom = prevk - lower;
        float perc = denom != 0.0f ? (dist - lower) / denom : 0.0f;
        if (dist == 0.0f) perc = 0.0f;
        float ms = (max_scale[i_lb] + perc * (max_scale[i_prev] - max_scale[i_lb]))
                   * 1.05f;  // SAMPLING_ERROR_CORRECTION (zoic.cpp:1463, 1891)
        float tr = centroid[i_lb] + perc * (centroid[i_prev] - centroid[i_lb]);
        float lx, ly;
        concentric_disk(u, v, &lx, &ly);
        float ax = lx * ms + tr;
        float ay = ly * ms;
        float theta = std::atan2(origin.y, origin.x);
        float sn = fast_sin(theta), cs = fast_cos(theta);
        float tx = ax * cs - ay * sn;
        float ty = ax * sn + ay * cs;
        Vec3 dir{tx - origin.x, ty - origin.y, -first_thick};
        bool ok = trace_stack(&s, &origin, &dir);
        origin = origin * -1.0f;
        dir = dir * -1.0f;
        std::printf("{\"ok\":%s,", ok ? "true" : "false");
        emit_vec("origin", origin, true);
        emit_vec("dir", dir, false);
        std::printf("}%s", k + 1 < n ? "," : "");
    }
    std::printf("]}\n");
    return 0;
}

// First-attempt thin-lens rays incl. DOF + empirical vignetting test
// (zoic.cpp:1771-1848, 1297-1305 behavior minus retries).
int cmd_thinlens(int argc, char **argv) {
    float sw = std::strtof(argv[2], nullptr);
    float focal = std::strtof(argv[4], nullptr);
    float fstop = std::strtof(argv[5], nullptr);
    float focus = std::strtof(argv[6], nullptr);
    float ovd = std::strtof(argv[7], nullptr);
    float ovr = std::strtof(argv[8], nullptr);
    int n = std::atoi(argv[9]);
    float fov = 2.0f * std::atan(sw / (2.0f * focal));
    float tan_fov = std::tan(fov / 2.0f);
    float ap_radius = focal / (2.0f * fstop);
    std::printf("{\"tan_fov\":%.9g,\"aperture_radius\":%.9g,\"rays\":[",
                tan_fov, ap_radius);
    for (int k = 0; k < n; k++) {
        float sx, sy, u, v;
        if (std::scanf("%f %f %f %f", &sx, &sy, &u, &v) != 4) break;
        Vec3 p{sx * tan_fov, sy * tan_fov, 1.0f};
        Vec3 origin{0, 0, 0};
        Vec3 dir = normalize(p - origin);
        float lx, ly;
        concentric_disk(u, v, &lx, &ly);
        lx *= ap_radius;
        ly *= ap_radius;
        origin = {lx, ly, 0.0f};
        float t = std::abs(focus / dir.z);
        Vec3 focus_pt = dir * t;
        dir = normalize(focus_pt - origin);
        bool pass = true;
        if (ovd > 0.0f) {
            Vec3 pt = (dir * ovd) - origin;
            float hyp = std::sqrt(pt.x * pt.x + pt.y * pt.y);
            pass = std::abs(hyp) < ap_radius * ovr;
        }
        dir.z *= -1.0f;
        std::printf("{\"ok\":%s,", pass ? "true" : "false");
        emit_vec("origin", origin, true);
        emit_vec("dir", dir, false);
        std::printf("}%s", k + 1 < n ? "," : "");
    }
    std::printf("]}\n");
    return 0;
}

// Two-level CDF bokeh sampler build + inversion (zoic.cpp:222-485
// behavior; stable descending sorts — see PARITY.md item 9).
int cmd_bokeh(int argc, char **argv) {
    int w = std::atoi(argv[2]), h = std::atoi(argv[3]), n = std::atoi(argv[4]);
    std::vector<float> lum(w * h);
    for (int i = 0; i < w * h; i++) {
        float r, g, b;
        if (std::scanf("%f %f %f", &r, &g, &b) != 3) return 2;
        lum[i] = r * 0.3f + g * 0.59f + b * 0.11f;
    }
    float total = 0.0f;
    for (float x : lum) total += x;
    std::vector<float> norm(w * h);
    float inv = 1.0f / total;
    for (int i = 0; i < w * h; i++) norm[i] = lum[i] * inv;
    std::vector<float> row_sum(h, 0.0f);
    for (int r = 0, i = 0; r < h; r++)
        for (int c = 0; c < w; c++, i++) row_sum[r] += norm[i];
    std::vector<int> row_idx(h);
    for (int i = 0; i < h; i++) row_idx[i] = i;
    std::stable_sort(row_idx.begin(), row_idx.end(),
                     [&](int a, int b) { return row_sum[a] > row_sum[b]; });
    std::vector<float> cdf_row(h);
    float prev = 0.0f;
    for (int i = 0; i < h; i++) {
        cdf_row[i] = prev + row_sum[row_idx[i]];
        prev = cdf_row[i];
    }
    std::vector<float> per_row(w * h);
    for (int r = 0, i = 0; r < h; r++)
        for (int c = 0; c < w; c++, i++)
            per_row[i] = (norm[i] != 0 && row_sum[r] != 0) ? norm[i] / row_sum[r]
                                                           : 0.0f;
    std::vector<int> col_idx(w * h);
    for (int i = 0; i < w * h; i++) col_idx[i] = i;
    for (int i = 0; i < w * h; i += w)
        std::stable_sort(col_idx.begin() + i, col_idx.begin() + i + w,
                         [&](int a, int b) { return per_row[a] > per_row[b]; });
    std::vector<float> cdf_col(w * h);
    for (int r = 0, i = 0; r < h; r++) {
        prev = 0.0f;
        for (int c = 0; c < w; c++, i++) {
            cdf_col[i] = prev + per_row[col_idx[i]];
            prev = cdf_col[i];
        }
    }
    std::printf("{\"samples\":[");
    for (int k = 0; k < n; k++) {
        float ur, uc;
        if (std::scanf("%f %f", &ur, &uc) != 2) break;
        auto ub = std::upper_bound(cdf_row.begin(), cdf_row.end(), ur);
        int r = ub >= cdf_row.end() ? h - 1 : (int)(ub - cdf_row.begin());
        int actual_row = row_idx[r];
        int recalc_row = actual_row - (w - 1) / 2;
        int start = actual_row * w;
        auto ubc = std::upper_bound(cdf_col.begin() + start,
                                    cdf_col.begin() + start + w, uc);
        int c = ubc >= cdf_col.begin() + start + w
                    ? start + w - 1
                    : (int)(ubc - cdf_col.begin());
        int actual_col = col_idx[c];
        int rel_col = actual_col - start;
        int recalc_col = rel_col - (h - 1) / 2;
        float fx = (float)recalc_col;
        float fy = (float)recalc_row * -1.0f;
        std::printf("[%.9g,%.9g]%s", (float)(fx / (float)w * 2.0),
                    (float)(fy / (float)h * 2.0), k + 1 < n ? "," : "");
    }
    std::printf("]}\n");
    return 0;
}

}  // namespace

int main(int argc, char **argv) {
    if (argc < 2) {
        std::fprintf(stderr,
                     "usage: oracle solve|trace|thinlens|bokeh ...\n");
        return 2;
    }
    if (!std::strcmp(argv[1], "solve") && argc >= 6) return cmd_solve(argc, argv);
    if (!std::strcmp(argv[1], "trace") && argc >= 7) return cmd_trace(argc, argv);
    if (!std::strcmp(argv[1], "tracelut") && argc >= 9)
        return cmd_tracelut(argc, argv);
    if (!std::strcmp(argv[1], "thinlens") && argc >= 10)
        return cmd_thinlens(argc, argv);
    if (!std::strcmp(argv[1], "bokeh") && argc >= 5) return cmd_bokeh(argc, argv);
    std::fprintf(stderr, "bad arguments\n");
    return 2;
}
