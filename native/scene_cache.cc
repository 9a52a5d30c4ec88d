// scene_cache: multithreaded .npy pack/load for SCADE scene data.
//
// The SCADE scene loader reads K hypothesis .npy files per training image
// (20 x N_train small files, data/load_scene.py:316-345 in the reference) —
// on network filesystems that's thousands of serial open/parse/read calls
// and dominates cold-start latency of a 500k-step run. This library:
//
//   1. packs a list of float32 .npy files into ONE contiguous blob with an
//      index header (tools: scade_tpu.data.native_cache.pack), and
//   2. loads a blob (or a list of raw .npy files) into a caller-provided
//      buffer with a thread pool doing parallel pread.
//
// Exposed as a plain C ABI consumed via ctypes — no pybind11 dependency.
//
// Blob layout (little endian):
//   magic "SCBLOB01" (8 bytes)
//   uint64 n_arrays
//   n_arrays x { uint64 offset, uint64 n_floats }
//   payload: float32 data, arrays back to back
//
// Build: see tools/build_native.py (g++ -O3 -shared -fPIC -pthread).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr char kMagic[8] = {'S', 'C', 'B', 'L', 'O', 'B', '0', '1'};

// Minimal NPY parser: returns payload offset and element count for a
// little-endian float32 array, or -1 on unsupported files.
int64_t parse_npy_header(FILE* f, int64_t* n_floats) {
  unsigned char pre[10];
  if (fread(pre, 1, 10, f) != 10) return -1;
  if (memcmp(pre, "\x93NUMPY", 6) != 0) return -1;
  const int major = pre[6];
  uint32_t header_len;
  if (major == 1) {
    header_len = pre[8] | (pre[9] << 8);
  } else {
    unsigned char ext[2];
    if (fread(ext, 1, 2, f) != 2) return -1;
    header_len = pre[8] | (pre[9] << 8) | (ext[0] << 16) | (ext[1] << 24);
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) return -1;
  if (header.find("'descr': '<f4'") == std::string::npos &&
      header.find("\"descr\": \"<f4\"") == std::string::npos)
    return -1;
  if (header.find("'fortran_order': False") == std::string::npos &&
      header.find("\"fortran_order\": false") == std::string::npos)
    return -1;
  const auto sp = header.find("'shape':");
  const auto open = header.find('(', sp);
  const auto close = header.find(')', open);
  if (sp == std::string::npos || open == std::string::npos ||
      close == std::string::npos)
    return -1;
  int64_t count = 1;
  std::string dims = header.substr(open + 1, close - open - 1);
  char* end = nullptr;
  const char* p = dims.c_str();
  bool any = false;
  while (*p) {
    while (*p == ' ' || *p == ',') ++p;
    if (!*p) break;
    const long long d = strtoll(p, &end, 10);
    if (end == p) break;
    count *= d;
    any = true;
    p = end;
  }
  if (!any) count = 1;  // 0-d array
  *n_floats = count;
  const int64_t payload = (major == 1 ? 10 : 12) + header_len;
  return payload;
}

void parallel_for(int64_t n, int n_threads, void (*fn)(int64_t, void*),
                  void* ctx) {
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    while (true) {
      const int64_t i = next.fetch_add(1);
      if (i >= n) break;
      fn(i, ctx);
    }
  };
  std::vector<std::thread> pool;
  // hardware_concurrency() may legally return 0 (restricted cgroups);
  // zero workers would leave every counts[] slot uninitialized garbage
  const int hw = (int)std::thread::hardware_concurrency();
  const int t = n_threads > 0 ? n_threads : (hw > 0 ? hw : 1);
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

struct LoadJob {
  const char** paths;
  float* out;
  const int64_t* offsets;     // per-array start (in floats) within out
  const int64_t* capacities;  // per-array float capacity within out
  int64_t* counts;            // out: per-array float counts (or -1 on error)
};

void load_one(int64_t i, void* ctx) {
  auto* job = static_cast<LoadJob*>(ctx);
  FILE* f = fopen(job->paths[i], "rb");
  if (!f) {
    job->counts[i] = -1;
    return;
  }
  int64_t n = 0;
  const int64_t payload = parse_npy_header(f, &n);
  // The caller sized the output region from an earlier pre-pass; if the
  // file grew between the two passes, trusting this second header parse
  // would overrun the caller's buffer — fail the file instead.
  if (payload < 0 || n > job->capacities[i]) {
    fclose(f);
    job->counts[i] = -1;
    return;
  }
  if (fseek(f, (long)payload, SEEK_SET) != 0 ||
      fread(job->out + job->offsets[i], sizeof(float), (size_t)n, f) !=
          (size_t)n) {
    fclose(f);
    job->counts[i] = -1;
    return;
  }
  fclose(f);
  job->counts[i] = n;
}

}  // namespace

extern "C" {

// Returns the float count of a .npy file, or -1 if unsupported.
int64_t scade_npy_count(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t n = 0;
  const int64_t ok = parse_npy_header(f, &n);
  fclose(f);
  return ok < 0 ? -1 : n;
}

// Parallel header pre-pass: counts[i] = float count of paths[i] (-1 if
// unsupported). On network filesystems the per-file open/parse round trip
// is the latency the batch loader exists to hide — a serial Python
// pre-pass would reintroduce it.
int64_t scade_npy_count_batch(const char** paths, int64_t n, int64_t* counts,
                              int n_threads) {
  struct Ctx {
    const char** paths;
    int64_t* counts;
  } ctx{paths, counts};
  parallel_for(
      n, n_threads,
      [](int64_t i, void* c) {
        auto* x = static_cast<Ctx*>(c);
        x->counts[i] = scade_npy_count(x->paths[i]);
      },
      &ctx);
  int64_t failures = 0;
  for (int64_t i = 0; i < n; ++i)
    if (counts[i] < 0) ++failures;
  return failures;
}

// Parallel-load n .npy float32 files into `out`; `offsets[i]` is the float
// offset of file i within `out` and `capacities[i]` the region's float
// capacity; fills counts[i] with per-file float counts (-1 on failure,
// including a file whose header now claims more floats than its capacity).
// Returns 0 on success, k>0 = number of failed files.
int64_t scade_load_npy_batch(const char** paths, int64_t n,
                             const int64_t* offsets, const int64_t* capacities,
                             float* out, int64_t* counts, int n_threads) {
  LoadJob job{paths, out, offsets, capacities, counts};
  parallel_for(n, n_threads, load_one, &job);
  int64_t failures = 0;
  for (int64_t i = 0; i < n; ++i)
    if (counts[i] < 0) ++failures;
  return failures;
}

// Pack already-loaded data into a blob file. `data` is the concatenated
// float payload, `sizes[i]` the float count of array i.
int64_t scade_write_blob(const char* path, const float* data,
                         const int64_t* sizes, int64_t n_arrays) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  fwrite(kMagic, 1, 8, f);
  uint64_t n = (uint64_t)n_arrays;
  fwrite(&n, sizeof(n), 1, f);
  uint64_t offset = 0;
  for (int64_t i = 0; i < n_arrays; ++i) {
    uint64_t sz = (uint64_t)sizes[i];
    fwrite(&offset, sizeof(offset), 1, f);
    fwrite(&sz, sizeof(sz), 1, f);
    offset += sz;
  }
  fwrite(data, sizeof(float), (size_t)offset, f);
  // the final buffered flush happens inside fclose — a full disk surfaces
  // there, so its return value is part of the success check
  const bool bad = ferror(f) != 0;
  return (fclose(f) != 0 || bad) ? -1 : 0;
}

// Read blob header: fills n_arrays; returns total float count or -1.
int64_t scade_blob_info(const char* path, int64_t* n_arrays) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char magic[8];
  uint64_t n = 0;
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, kMagic, 8) != 0 ||
      fread(&n, sizeof(n), 1, f) != 1) {
    fclose(f);
    return -1;
  }
  int64_t total = 0;
  for (uint64_t i = 0; i < n; ++i) {
    uint64_t off, sz;
    if (fread(&off, sizeof(off), 1, f) != 1 ||
        fread(&sz, sizeof(sz), 1, f) != 1) {
      fclose(f);
      return -1;
    }
    total = (int64_t)(off + sz);
  }
  fclose(f);
  *n_arrays = (int64_t)n;
  return total;
}

// Load the full blob payload into out (and per-array sizes into sizes).
int64_t scade_read_blob(const char* path, float* out, int64_t* sizes,
                        int64_t n_arrays) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 8 + (long)sizeof(uint64_t), SEEK_SET);
  int64_t total = 0;
  for (int64_t i = 0; i < n_arrays; ++i) {
    uint64_t off, sz;
    if (fread(&off, sizeof(off), 1, f) != 1 ||
        fread(&sz, sizeof(sz), 1, f) != 1) {
      fclose(f);
      return -1;
    }
    sizes[i] = (int64_t)sz;
    total = (int64_t)(off + sz);
  }
  const size_t got = fread(out, sizeof(float), (size_t)total, f);
  fclose(f);
  return got == (size_t)total ? 0 : -1;
}

}  // extern "C"
