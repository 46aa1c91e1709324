// Native (C++) runtime components for pyapes-tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this library provides the
// host-side native tier:
//   * an independent double-precision reference implementation of the
//     per-axis coefficient-vector stencil (test oracle, complementing
//     numpy.gradient),
//   * a streaming binary field snapshot writer/reader with CRC32
//     integrity (checkpoint fast path: no compression, sequential IO).
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------
// Reference stencil: out[i] = sum_axes ap[k]*x[i+e_k] + ac[k]*x[i]
//                                + am[k]*x[i-e_k]   (wrap-around)
// x: (n0 [, n1 [, n2]]) row-major f64; coefficient vectors per axis.
// ---------------------------------------------------------------------
void stencil_apply_ref(
    const double* x, double* out,
    const int64_t* dims, int ndim,
    const double* const* ap, const double* const* ac,
    const double* const* am) {
  int64_t n0 = dims[0];
  int64_t n1 = ndim > 1 ? dims[1] : 1;
  int64_t n2 = ndim > 2 ? dims[2] : 1;
  int64_t s0 = n1 * n2, s1 = n2;

  for (int64_t i = 0; i < n0; ++i) {
    int64_t ip = (i + 1) % n0, im = (i - 1 + n0) % n0;
    for (int64_t j = 0; j < n1; ++j) {
      int64_t jp = (j + 1) % n1, jm = (j - 1 + n1) % n1;
      for (int64_t k = 0; k < n2; ++k) {
        int64_t kp = (k + 1) % n2, km = (k - 1 + n2) % n2;
        int64_t c = i * s0 + j * s1 + k;
        double acc = ap[0][i] * x[ip * s0 + j * s1 + k] +
                     ac[0][i] * x[c] +
                     am[0][i] * x[im * s0 + j * s1 + k];
        if (ndim > 1) {
          acc += ap[1][j] * x[i * s0 + jp * s1 + k] +
                 ac[1][j] * x[c] +
                 am[1][j] * x[i * s0 + jm * s1 + k];
        }
        if (ndim > 2) {
          acc += ap[2][k] * x[i * s0 + j * s1 + kp] +
                 ac[2][k] * x[c] +
                 am[2][k] * x[i * s0 + j * s1 + km];
        }
        out[c] = acc;
      }
    }
  }
}

// ---------------------------------------------------------------------
// CRC32 (IEEE, table-driven)
// ---------------------------------------------------------------------
static uint32_t crc_table[256];
static bool crc_init_done = false;

static void crc_init() {
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int j = 0; j < 8; ++j)
      c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
    crc_table[i] = c;
  }
  crc_init_done = true;
}

uint32_t crc32_buf(const uint8_t* buf, uint64_t len, uint32_t seed) {
  if (!crc_init_done) crc_init();
  uint32_t c = seed ^ 0xFFFFFFFFu;
  for (uint64_t i = 0; i < len; ++i)
    c = crc_table[(c ^ buf[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

// ---------------------------------------------------------------------
// Snapshot IO: [magic u32][ndim i32][dims i64 x ndim][dtype i32 (4|8)]
//              [payload][crc32 u32]
// Returns 0 on success.
// ---------------------------------------------------------------------
static const uint32_t kMagic = 0x50594150;  // "PYAP"

int snapshot_write(const char* path, const void* data,
                   const int64_t* dims, int ndim, int itemsize) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  uint64_t n = 1;
  for (int i = 0; i < ndim; ++i) n *= (uint64_t)dims[i];
  uint64_t bytes = n * (uint64_t)itemsize;
  uint32_t crc = crc32_buf((const uint8_t*)data, bytes, 0);
  int32_t nd = ndim, isz = itemsize;
  bool ok = fwrite(&kMagic, 4, 1, f) == 1 && fwrite(&nd, 4, 1, f) == 1 &&
            fwrite(dims, 8, (size_t)ndim, f) == (size_t)ndim &&
            fwrite(&isz, 4, 1, f) == 1 &&
            fwrite(data, 1, bytes, f) == bytes &&
            fwrite(&crc, 4, 1, f) == 1;
  fclose(f);
  return ok ? 0 : -2;
}

// Reads header into dims/ndim/itemsize when data==nullptr; reads payload
// (validating CRC) otherwise. Returns 0 ok, -3 bad magic, -4 bad crc.
int snapshot_read(const char* path, void* data, int64_t* dims,
                  int32_t* ndim, int32_t* itemsize) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint32_t magic = 0;
  if (fread(&magic, 4, 1, f) != 1 || magic != kMagic) {
    fclose(f);
    return -3;
  }
  int32_t nd = 0, isz = 0;
  if (fread(&nd, 4, 1, f) != 1 || nd < 1 || nd > 8) { fclose(f); return -2; }
  if (fread(dims, 8, (size_t)nd, f) != (size_t)nd) { fclose(f); return -2; }
  if (fread(&isz, 4, 1, f) != 1) { fclose(f); return -2; }
  *ndim = nd;
  *itemsize = isz;
  if (data == nullptr) {
    fclose(f);
    return 0;
  }
  uint64_t n = 1;
  for (int i = 0; i < nd; ++i) n *= (uint64_t)dims[i];
  uint64_t bytes = n * (uint64_t)isz;
  if (fread(data, 1, bytes, f) != bytes) { fclose(f); return -2; }
  uint32_t crc_file = 0;
  if (fread(&crc_file, 4, 1, f) != 1) { fclose(f); return -2; }
  fclose(f);
  uint32_t crc = crc32_buf((const uint8_t*)data, bytes, 0);
  return crc == crc_file ? 0 : -4;
}

}  // extern "C"
