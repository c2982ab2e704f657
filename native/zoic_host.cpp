// zoic-tpu native host runtime library.
//
// The reference implements its entire host runtime in C++ (the Arnold
// plugin, src/zoic.cpp); in the TPU-native design the hot path lives in
// Pallas kernels, and this library provides the native host-side runtime
// around them: lens-prescription ingestion (parse + cleanup,
// zoic.cpp:708-959 semantics) and double-precision reference solvers
// (focal-length probe zoic.cpp:1161-1228, backwards focus solve
// zoic.cpp:1054-1095) used for high-accuracy host validation.  Exposed as a
// plain C ABI for ctypes (no pybind11 in the image).
//
// Build: make -C native   (produces libzoic_host.so)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

namespace {

struct V3 {
    double x = 0, y = 0, z = 0;
};
V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
V3 operator*(V3 a, double s) { return {a.x * s, a.y * s, a.z * s}; }
double dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
V3 normalize(V3 a) { return a * (1.0 / std::sqrt(dot(a, a))); }

bool is_delim(char c) {
    return c == '\t' || c == ',' || c == ';' || c == ':' || c == ' ' ||
           c == '\r';
}

struct Parsed {
    std::vector<double> curv, thick, ior, abbe, ap;
    int aperture_element = -1;
    int columns = 0;
};

// Tokenizing parser with column autodetect, '#' comments, rear-first
// reversal (zoic.cpp:708-914 semantics).
int parse_file(const char *path, Parsed *out) {
    std::ifstream f(path);
    if (!f) return -1;
    std::vector<std::vector<double>> rows;
    std::string line;
    long total_tokens = 0;
    while (std::getline(f, line)) {
        if (line.empty() || line[0] == '#') continue;
        std::vector<double> row;
        std::string cur;
        for (char ch : line) {
            if (is_delim(ch)) {
                if (!cur.empty()) {
                    row.push_back(std::strtod(cur.c_str(), nullptr));
                    cur.clear();
                }
            } else {
                cur.push_back(ch);
            }
        }
        if (!cur.empty()) row.push_back(std::strtod(cur.c_str(), nullptr));
        if (row.empty()) continue;
        total_tokens += (long)row.size();
        rows.push_back(std::move(row));
    }
    if (rows.empty()) return -2;
    int cols = (int)((double)total_tokens / (double)rows.size());
    if (cols < 4 || cols > 5) return -3;
    out->columns = cols;
    for (auto &r : rows) {
        if ((int)r.size() != cols) return -4;
        out->curv.push_back(r[0]);
        out->thick.push_back(r[1]);
        out->ior.push_back(r[2]);
        out->abbe.push_back(cols == 5 ? r[3] : 0.0);
        out->ap.push_back(cols == 5 ? r[4] : r[3]);
    }
    auto rev = [](std::vector<double> &v) {
        for (size_t i = 0, j = v.size() - 1; i < j; ++i, --j)
            std::swap(v[i], v[j]);
    };
    rev(out->curv);
    rev(out->thick);
    rev(out->ior);
    rev(out->abbe);
    rev(out->ap);
    return (int)rows.size();
}

// Aperture flatten, air IOR fix, mm->cm, rear-shift (zoic.cpp:917-959).
int cleanup(Parsed *p) {
    int ap_count = 0;
    for (size_t i = 0; i < p->curv.size(); ++i) {
        if (p->curv[i] == 0.0) {
            p->aperture_element = (int)i;
            p->curv[i] = 99999.0;
            if (++ap_count > 1) return -5;
        }
        if (p->ior[i] == 0.0) p->ior[i] = 1.0;
    }
    double summed = 0.0;
    for (size_t i = 0; i < p->curv.size(); ++i) {
        p->curv[i] *= 0.1;
        p->thick[i] *= 0.1;
        p->ap[i] *= 0.1;
        summed += p->thick[i];
    }
    p->thick[0] -= summed;
    return 0;
}

V3 sphere_isect(V3 o, V3 d, double cz, double r, bool reverse) {
    d = normalize(d);
    V3 L = V3{0, 0, cz} - o;
    double tca = dot(L, d);
    double d2 = dot(L, L) - tca * tca;
    double thc = std::sqrt(std::abs(r * r - d2));
    double sign = r < 0 ? -1.0 : 1.0;
    double t = reverse ? tca - thc * sign : tca + thc * sign;
    return o + d * t;
}

V3 refract(V3 i, V3 n, double n1, double n2) {
    i = normalize(i);
    n = normalize(n);
    double eta = n1 / n2;
    double c1 = -dot(i, n);
    double cs2 = eta * eta * (1.0 - c1 * c1);
    return i * eta + n * (eta * c1 - std::sqrt(std::abs(1.0 - cs2)));
}

}  // namespace

extern "C" {

// Parse + cleanup a .dat file into caller buffers of capacity `cap`
// (doubles).  Returns element count, or <0 on error (-1 open, -2 empty,
// -3 columns, -4 ragged row, -5 multiple apertures, -6 capacity).
// aperture_element receives the iris index or -1.
int zoic_parse_lens(const char *path, int cap, double *curv, double *thick,
                    double *ior, double *abbe, double *ap,
                    int *aperture_element) {
    Parsed p;
    int n = parse_file(path, &p);
    if (n < 0) return n;
    int rc = cleanup(&p);
    if (rc < 0) return rc;
    if (n > cap) return -6;
    std::memcpy(curv, p.curv.data(), n * sizeof(double));
    std::memcpy(thick, p.thick.data(), n * sizeof(double));
    std::memcpy(ior, p.ior.data(), n * sizeof(double));
    std::memcpy(abbe, p.abbe.data(), n * sizeof(double));
    std::memcpy(ap, p.ap.data(), n * sizeof(double));
    *aperture_element = p.aperture_element;
    return n;
}

// Double-precision focal-length probe (zoic.cpp:1161-1228 semantics).
// Outputs: out[0]=focal, out[1]=principal plane z, out[2]=focal point z.
void zoic_trace_focal(const double *curv, const double *thick,
                      const double *ior, const double *ap, int n,
                      double *out) {
    double h = ap[0] * 0.1;
    V3 origin{0, h, 0};
    V3 dir{0, 0, 99999.0};
    double summed = 0, pp = 0, fp = 0;
    for (int i = 0; i < n; ++i) {
        summed += thick[i];
        double cz = summed - curv[i];
        V3 hit = sphere_isect(origin, dir, cz, curv[i], false);
        double sign = curv[i] < 0 ? -1.0 : 1.0;
        V3 nrm = normalize(V3{0, 0, cz} - hit) * sign;
        double n2 = i == n - 1 ? 1.0 : ior[i + 1];
        double eta = ior[i] / n2;
        double c1 = -dot(normalize(dir), nrm);
        double cs2 = eta * eta * (1.0 - c1 * c1);
        bool tir = (ior[i] > n2) && (cs2 > 1.0);
        if (!tir) dir = refract(dir, nrm, ior[i], n2);
        if (i == n - 1) {
            // principal plane: intersect the incoming height line with the
            // exit ray line in the (z, y) plane
            V3 dn = normalize(dir);
            // line through (origin.z, origin.y) with slope dn.y/dn.z meets
            // y = h at z = origin.z + (h - origin.y) * dn.z / dn.y
            pp = origin.z + (h - origin.y) * dn.z / dn.y;
            fp = origin.z + (0.0 - origin.y) * dn.z / dn.y;
        }
        origin = hit;
    }
    out[0] = fp - pp;
    out[1] = pp;
    out[2] = fp;
}

// Double-precision backwards focus solve (zoic.cpp:1054-1095 semantics).
double zoic_image_distance(const double *curv, const double *thick,
                           const double *ior, const double *ap, int n,
                           double object_distance) {
    V3 origin{0, 0, object_distance};
    V3 dir{0, (ap[n - 1] / 2.0) * 0.05, -object_distance};
    double summed = 0;
    for (int i = 0; i < n; ++i) summed += thick[i];
    double img = 0;
    for (int i = 0; i < n; ++i) {
        if (i != 0) summed -= thick[n - i];
        int j = n - 1 - i;
        double cz = summed - curv[j];
        V3 hit = sphere_isect(origin, dir, cz, curv[j], true);
        double sign = -curv[j] < 0 ? -1.0 : 1.0;
        V3 nrm = normalize(V3{0, 0, cz} - hit) * sign;
        double n1 = i == 0 ? 1.0 : ior[n - i];
        dir = refract(dir, nrm, n1, ior[j]);
        if (i == n - 1) {
            V3 dn = normalize(dir);
            img = hit.z + (0.0 - hit.y) * dn.z / dn.y;
        }
        origin = hit;
    }
    return img;
}

// Scale curvature/thickness/aperture in place (adjustFocalLength,
// zoic.cpp:1231-1237).
void zoic_rescale(double *curv, double *thick, double *ap, int n,
                  double ratio) {
    for (int i = 0; i < n; ++i) {
        curv[i] *= ratio;
        thick[i] *= ratio;
        ap[i] *= ratio;
    }
}

int zoic_host_abi_version(void) { return 1; }

}  // extern "C"
