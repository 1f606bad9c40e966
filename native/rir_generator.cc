// Image-method room impulse response generator (Allen & Berkley, with
// fractional-delay windowed-sinc injection and polar mic patterns).
//
// TPU-native framework's host-side native component, exposed through a C
// ABI for ctypes.  Behavioral parity target:
// /root/reference/include/rir-generator.{h,cc} (itself an ehabets
// RIR-Generator port): T60 <-> reflection-coefficient handling via Sabine,
// bounded image order, Hann-windowed sinc of width 2*round(0.004*fs),
// optional 100 Hz high-pass.  Implementation is fresh: flat C ABI, image
// loops restructured with per-axis precomputation, OpenMP-free (callers
// parallelize over rooms/process pool).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

inline double sinc(double x) { return x == 0.0 ? 1.0 : std::sin(x) / x; }

double polar_gain(double px, double py, double pz, double rho,
                  double az, double el) {
  if (rho == 1.0) return 1.0;
  double norm = std::sqrt(px * px + py * py + pz * pz);
  if (norm == 0.0) return 1.0;
  double theta = std::acos(pz / norm);
  double phi = std::atan2(py, px);
  double gain = std::sin(kPi / 2 - el) * std::sin(theta) * std::cos(az - phi) +
                std::cos(kPi / 2 - el) * std::cos(theta);
  return rho + (1.0 - rho) * gain;
}

}  // namespace

extern "C" {

// Convert T60 -> uniform reflection coefficient via the Sabine/Eyring
// relation used by the reference (alfa = 24 V ln10 / (c S T60)).
// Returns 0 on success, -1 when the room/T60 combination is infeasible.
int rir_beta_from_t60(const double room[3], double t60, double velocity,
                      double beta_out[6]) {
  if (t60 <= 0) {
    for (int i = 0; i < 6; i++) beta_out[i] = 0.0;
    return 0;
  }
  double volume = room[0] * room[1] * room[2];
  double surface =
      2.0 * (room[0] * room[1] + room[0] * room[2] + room[1] * room[2]);
  double alfa = 24.0 * volume * std::log(10.0) / (velocity * surface * t60);
  if (alfa > 1.0) return -1;
  double b = std::sqrt(1.0 - alfa);
  for (int i = 0; i < 6; i++) beta_out[i] = b;
  return 0;
}

// T60 from explicit reflection coefficients (Sabine), floored at 0.128 s.
double rir_t60_from_beta(const double room[3], const double beta[6],
                         double velocity) {
  double volume = room[0] * room[1] * room[2];
  double alpha =
      ((1 - beta[0] * beta[0]) + (1 - beta[1] * beta[1])) * room[1] * room[2] +
      ((1 - beta[2] * beta[2]) + (1 - beta[3] * beta[3])) * room[0] * room[2] +
      ((1 - beta[4] * beta[4]) + (1 - beta[5] * beta[5])) * room[0] * room[1];
  double t60 = 24.0 * std::log(10.0) * volume / (velocity * alpha);
  return t60 < 0.128 ? 0.128 : t60;
}

// Generate RIRs for num_mics receivers into rir[num_mics * num_samples]
// (row-major).  mic_rho: polar-pattern rho (1=omni, .75=sub, .5=cardioid,
// .25=hyper, 0=bidirectional); angle = {azimuth, elevation} radians.
void rir_generate(const double room[3], const double src[3],
                  const double* mics, int32_t num_mics,
                  const double beta[6], double velocity, double fs,
                  int32_t num_samples, int32_t order, int32_t hp_filter,
                  double mic_rho, const double angle[2], float* rir) {
  const double cts = velocity / fs;
  const double sx = src[0] / cts, sy = src[1] / cts, sz = src[2] / cts;
  const double tx = room[0] / cts, ty = room[1] / cts, tz = room[2] / cts;
  const int32_t tw = 2 * static_cast<int32_t>(0.004 * fs + 0.5);

  std::memset(rir, 0, sizeof(float) * num_mics * num_samples);

  for (int32_t m = 0; m < num_mics; m++) {
    const double rx = mics[3 * m] / cts, ry = mics[3 * m + 1] / cts,
                 rz = mics[3 * m + 2] / cts;
    float* out = rir + m * num_samples;

    const int32_t nx = static_cast<int32_t>(std::ceil(num_samples / (2 * tx)));
    const int32_t ny = static_cast<int32_t>(std::ceil(num_samples / (2 * ty)));
    const int32_t nz = static_cast<int32_t>(std::ceil(num_samples / (2 * tz)));

    for (int32_t x = -nx; x <= nx; x++) {
      const double rm_x = 2.0 * x * tx;
      for (int32_t q = 0; q <= 1; q++) {
        const double px = (1 - 2 * q) * sx - rx + rm_x;
        const double refl_x = std::pow(beta[0], std::abs(x - q)) *
                              std::pow(beta[1], std::abs(x));
        for (int32_t y = -ny; y <= ny; y++) {
          const double rm_y = 2.0 * y * ty;
          for (int32_t j = 0; j <= 1; j++) {
            const double py = (1 - 2 * j) * sy - ry + rm_y;
            const double refl_xy = refl_x * std::pow(beta[2], std::abs(y - j)) *
                                   std::pow(beta[3], std::abs(y));
            for (int32_t z = -nz; z <= nz; z++) {
              const double rm_z = 2.0 * z * tz;
              for (int32_t k = 0; k <= 1; k++) {
                if (order != -1 && std::abs(2 * x - q) + std::abs(2 * y - j) +
                                           std::abs(2 * z - k) >
                                       order)
                  continue;
                const double pz = (1 - 2 * k) * sz - rz + rm_z;
                const double refl = refl_xy *
                                    std::pow(beta[4], std::abs(z - k)) *
                                    std::pow(beta[5], std::abs(z));
                const double dist = std::sqrt(px * px + py * py + pz * pz);
                const double fdist = std::floor(dist);
                if (fdist >= num_samples) continue;
                const int32_t pos = static_cast<int32_t>(fdist) - tw / 2 + 1;
                const double gain = polar_gain(px, py, pz, mic_rho, angle[0],
                                               angle[1]) *
                                    refl / (4.0 * kPi * dist * cts);
                const double frac = dist - fdist;
                for (int32_t n = 0; n < tw; n++) {
                  const int32_t at = pos + n;
                  if (at < 0 || at >= num_samples) continue;
                  const double u = n + 1 - frac;
                  out[at] += static_cast<float>(
                      gain * 0.5 * (1.0 - std::cos(2.0 * kPi * (u / tw))) *
                      sinc(kPi * (u - tw / 2)));
                }
              }
            }
          }
        }
      }
    }

    if (hp_filter) {
      // 100 Hz second-order high-pass (reference's recursive form)
      const double w = 2.0 * kPi * 100.0 / fs;
      const double r1 = std::exp(-w);
      const double b1 = 2.0 * r1 * std::cos(w), b2 = -r1 * r1;
      const double a1 = -(1.0 + r1);
      double y1 = 0.0, y2 = 0.0, y3 = 0.0;
      for (int32_t i = 0; i < num_samples; i++) {
        const double x0 = out[i];
        y3 = y2;
        y2 = y1;
        y1 = b1 * y2 + b2 * y3 + x0;
        out[i] = static_cast<float>(y1 + a1 * y2 + r1 * y3);
      }
    }
  }
}

}  // extern "C"
