// Native NIfTI-1 volume loader for onestop_tpu.
//
// The reference does all volume IO through nibabel's pure-Python path
// (holdout.py:285-286). Here the host-side data loader is native: a small
// C++ library that parses NIfTI-1 headers, inflates gzip containers with
// zlib, applies scl_slope/scl_inter scaling, converts Fortran voxel order to
// C order, and decodes many volumes concurrently on a thread pool. Python
// binds via ctypes (onestop_tpu/data/native.py); the pure-Python reader in
// data/nifti.py stays as the fallback and golden reference.
//
// Build: make -C native  (produces libonestop_nifti.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <condition_variable>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

#pragma pack(push, 1)
struct NiftiHeader {
  int32_t sizeof_hdr;     // 348
  char pad0[36];
  int16_t dim[8];         // offset 40
  char pad1[14];
  int16_t datatype;       // offset 70
  int16_t bitpix;         // offset 72
  char pad2[2];
  float pixdim[8];        // offset 76
  float vox_offset;       // offset 108
  float scl_slope;        // offset 112
  float scl_inter;        // offset 116
  char pad3[224];
  char magic[4];          // offset 344
};
#pragma pack(pop)

static_assert(sizeof(NiftiHeader) == 348, "NIfTI-1 header must be 348 bytes");

// Read a whole file; transparently gunzip if it starts with the gzip magic.
bool read_file_maybe_gz(const char* path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> raw(static_cast<size_t>(n));
  size_t got = std::fread(raw.data(), 1, raw.size(), f);
  std::fclose(f);
  if (got != raw.size()) return false;

  if (raw.size() >= 2 && raw[0] == 0x1f && raw[1] == 0x8b) {
    // gzip container: inflate in growing chunks
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) return false;
    zs.next_in = raw.data();
    zs.avail_in = static_cast<uInt>(raw.size());
    out.clear();
    out.resize(raw.size() * 4 + (1u << 20));
    size_t produced = 0;
    int rc = Z_OK;
    while (rc != Z_STREAM_END) {
      if (produced == out.size()) out.resize(out.size() * 2);
      zs.next_out = out.data() + produced;
      zs.avail_out = static_cast<uInt>(out.size() - produced);
      rc = inflate(&zs, Z_NO_FLUSH);
      produced = zs.total_out;
      if (rc != Z_OK && rc != Z_STREAM_END) {
        inflateEnd(&zs);
        return false;
      }
    }
    inflateEnd(&zs);
    out.resize(produced);
  } else {
    out = std::move(raw);
  }
  return true;
}

template <typename T>
void convert_voxels(const uint8_t* src, double* dst, size_t n, double slope,
                    double inter, bool swap) {
  const T* v = reinterpret_cast<const T*>(src);
  for (size_t i = 0; i < n; ++i) {
    T x = v[i];
    if (swap && sizeof(T) > 1) {
      uint8_t tmp[sizeof(T)];
      std::memcpy(tmp, &v[i], sizeof(T));
      for (size_t b = 0; b < sizeof(T) / 2; ++b) std::swap(tmp[b], tmp[sizeof(T) - 1 - b]);
      std::memcpy(&x, tmp, sizeof(T));
    }
    dst[i] = static_cast<double>(x) * slope + inter;
  }
}

int16_t maybe_swap16(int16_t v, bool swap) {
  if (!swap) return v;
  uint16_t u;
  std::memcpy(&u, &v, 2);
  u = static_cast<uint16_t>((u >> 8) | (u << 8));
  std::memcpy(&v, &u, 2);
  return v;
}

float maybe_swapf(float v, bool swap) {
  if (!swap) return v;
  uint32_t u;
  std::memcpy(&u, &v, 4);
  u = __builtin_bswap32(u);
  std::memcpy(&v, &u, 4);
  return v;
}

}  // namespace

extern "C" {

// Parse header only. Returns 0 on success; fills dims[0..7] (dims[0] = ndim).
int onestop_nifti_dims(const char* path, int64_t* dims_out) {
  std::vector<uint8_t> buf;
  if (!read_file_maybe_gz(path, buf) || buf.size() < sizeof(NiftiHeader)) return 1;
  NiftiHeader h;
  std::memcpy(&h, buf.data(), sizeof(h));
  bool swap = false;
  if (h.sizeof_hdr != 348) {
    int32_t s = __builtin_bswap32(h.sizeof_hdr);
    if (s != 348) return 2;
    swap = true;
  }
  if (std::memcmp(h.magic, "n+1", 3) != 0 && std::memcmp(h.magic, "ni1", 3) != 0) return 3;
  int ndim = maybe_swap16(h.dim[0], swap);
  if (ndim < 1 || ndim > 7) return 4;
  dims_out[0] = ndim;
  for (int i = 1; i <= ndim; ++i) dims_out[i] = maybe_swap16(h.dim[i], swap);
  return 0;
}

// Load full volume as float64 in C order (last axis fastest) with scaling
// applied — nibabel get_fdata() semantics. dst must hold prod(dims) doubles.
// C order here means the Python wrapper sees shape (dim1, dim2, ..., dimN)
// with Fortran source order resolved, matching data/nifti.py exactly.
int onestop_nifti_load(const char* path, double* dst, int64_t dst_elems) {
  std::vector<uint8_t> buf;
  if (!read_file_maybe_gz(path, buf) || buf.size() < sizeof(NiftiHeader)) return 1;
  NiftiHeader h;
  std::memcpy(&h, buf.data(), sizeof(h));
  bool swap = false;
  if (h.sizeof_hdr != 348) {
    if (__builtin_bswap32(h.sizeof_hdr) != 348) return 2;
    swap = true;
  }
  int ndim = maybe_swap16(h.dim[0], swap);
  if (ndim < 1 || ndim > 7) return 4;
  int64_t shape[7];
  int64_t n = 1;
  for (int i = 0; i < ndim; ++i) {
    shape[i] = maybe_swap16(h.dim[i + 1], swap);
    n *= shape[i];
  }
  if (n != dst_elems) return 5;

  int dtype = maybe_swap16(h.datatype, swap);
  int bitpix = maybe_swap16(h.bitpix, swap);
  double slope = maybe_swapf(h.scl_slope, swap);
  double inter = maybe_swapf(h.scl_inter, swap);
  if (slope != slope) slope = 0.0;  // NaN
  if (inter != inter) inter = 0.0;
  if (slope == 0.0) { slope = 1.0; inter = (inter == 0.0 ? 0.0 : inter); }
  else if (slope == 1.0 && inter == 0.0) { /* identity */ }

  int64_t offset = (std::memcmp(h.magic, "n+1", 3) == 0)
                       ? static_cast<int64_t>(maybe_swapf(h.vox_offset, swap))
                       : 0;
  size_t bytes = static_cast<size_t>(n) * (bitpix / 8);
  if (buf.size() < static_cast<size_t>(offset) + bytes) return 6;
  const uint8_t* vox = buf.data() + offset;

  // decode Fortran-ordered voxels into a temp, then permute to C order
  std::vector<double> fort(static_cast<size_t>(n));
  switch (dtype) {
    case 2:    convert_voxels<uint8_t>(vox, fort.data(), n, slope, inter, swap); break;
    case 4:    convert_voxels<int16_t>(vox, fort.data(), n, slope, inter, swap); break;
    case 8:    convert_voxels<int32_t>(vox, fort.data(), n, slope, inter, swap); break;
    case 16:   convert_voxels<float>(vox, fort.data(), n, slope, inter, swap); break;
    case 64:   convert_voxels<double>(vox, fort.data(), n, slope, inter, swap); break;
    case 256:  convert_voxels<int8_t>(vox, fort.data(), n, slope, inter, swap); break;
    case 512:  convert_voxels<uint16_t>(vox, fort.data(), n, slope, inter, swap); break;
    case 768:  convert_voxels<uint32_t>(vox, fort.data(), n, slope, inter, swap); break;
    default:   return 7;
  }

  // Fortran (first axis fastest) -> C (last axis fastest)
  int64_t strides_f[7];
  int64_t acc = 1;
  for (int i = 0; i < ndim; ++i) { strides_f[i] = acc; acc *= shape[i]; }
  std::vector<int64_t> idx(ndim, 0);
  for (int64_t ci = 0; ci < n; ++ci) {
    int64_t fi = 0;
    for (int i = 0; i < ndim; ++i) fi += idx[i] * strides_f[i];
    dst[ci] = fort[static_cast<size_t>(fi)];
    for (int i = ndim - 1; i >= 0; --i) {
      if (++idx[i] < shape[i]) break;
      idx[i] = 0;
    }
  }
  return 0;
}

// Concurrent batch load on a thread pool: n_paths volumes, each into its own
// destination buffer. Returns 0 iff every volume loaded cleanly; per-volume
// status in status_out.
int onestop_nifti_load_batch(const char** paths, int n_paths, double** dsts,
                             const int64_t* dst_elems, int* status_out,
                             int n_threads) {
  if (n_threads <= 0) n_threads = static_cast<int>(std::thread::hardware_concurrency());
  if (n_threads > n_paths) n_threads = n_paths;
  std::mutex mu;
  int next = 0;
  auto worker = [&]() {
    for (;;) {
      int i;
      {
        std::lock_guard<std::mutex> lock(mu);
        if (next >= n_paths) return;
        i = next++;
      }
      status_out[i] = onestop_nifti_load(paths[i], dsts[i], dst_elems[i]);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  for (int i = 0; i < n_paths; ++i)
    if (status_out[i] != 0) return 1;
  return 0;
}

}  // extern "C"
