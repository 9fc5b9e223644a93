// sug_tpu native data runtime: npy ingest, normalization, batch assembly.
//
// TPU-native replacement for the reference's torch DataLoader worker
// processes (data/dataloader.py:39-69 + per-item numpy __getitem__): the
// host-side half of the input pipeline — .npy dump parsing, per-cloud
// center+max-norm normalization, optional fixed x-rotation, pad/subsample to
// a fixed point count, epoch shuffling, class-balanced batch sampling, and a
// background prefetch thread that overlaps batch assembly with device
// compute. The device-side half (rotation/jitter augmentation) stays inside
// the jitted train step.
//
// Exposed as a C ABI consumed via ctypes (sug_tpu/native/__init__.py).
//
// Build: make native   (g++ -O3 -march=native -shared -fPIC -pthread)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// minimal .npy parser (C-order, little-endian f4/f8/i4/i8)
// ---------------------------------------------------------------------------

struct NpyArray {
  std::vector<int64_t> shape;
  std::string dtype;  // "f4", "f8", "i4", "i8"
  std::vector<char> data;
  int64_t count() const {
    int64_t c = 1;
    for (auto s : shape) c *= s;
    return c;
  }
};

bool parse_npy(const char* path, NpyArray* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  char magic[6];
  if (std::fread(magic, 1, 6, f) != 6 || std::memcmp(magic, "\x93NUMPY", 6)) {
    std::fclose(f);
    return false;
  }
  unsigned char ver[2];
  if (std::fread(ver, 1, 2, f) != 2) { std::fclose(f); return false; }
  uint32_t header_len = 0;
  if (ver[0] == 1) {
    uint16_t h16;
    if (std::fread(&h16, 2, 1, f) != 1) { std::fclose(f); return false; }
    header_len = h16;
  } else {
    if (std::fread(&header_len, 4, 1, f) != 1) { std::fclose(f); return false; }
  }
  std::string header(header_len, '\0');
  if (std::fread(&header[0], 1, header_len, f) != header_len) {
    std::fclose(f);
    return false;
  }
  // descr
  auto dpos = header.find("'descr'");
  if (dpos == std::string::npos) { std::fclose(f); return false; }
  auto q1 = header.find('\'', dpos + 7);
  auto q2 = header.find('\'', q1 + 1);
  std::string descr = header.substr(q1 + 1, q2 - q1 - 1);
  if (descr.size() < 3 || (descr[0] != '<' && descr[0] != '|' && descr[0] != '=')) {
    std::fclose(f);
    return false;
  }
  out->dtype = descr.substr(1);
  // fortran_order must be False
  if (header.find("'fortran_order': True") != std::string::npos) {
    std::fclose(f);
    return false;
  }
  // shape tuple
  auto spos = header.find("'shape'");
  auto p1 = header.find('(', spos);
  auto p2 = header.find(')', p1);
  std::string shape_str = header.substr(p1 + 1, p2 - p1 - 1);
  out->shape.clear();
  size_t i = 0;
  while (i < shape_str.size()) {
    while (i < shape_str.size() && !isdigit(shape_str[i])) i++;
    if (i >= shape_str.size()) break;
    int64_t v = 0;
    while (i < shape_str.size() && isdigit(shape_str[i])) v = v * 10 + (shape_str[i++] - '0');
    out->shape.push_back(v);
  }
  int elem = (out->dtype == "f8" || out->dtype == "i8") ? 8 : 4;
  int64_t bytes = out->count() * elem;
  out->data.resize(bytes);
  bool ok = std::fread(out->data.data(), 1, bytes, f) == (size_t)bytes;
  std::fclose(f);
  return ok;
}

std::vector<float> to_f32(const NpyArray& a) {
  std::vector<float> out(a.count());
  if (a.dtype == "f4") {
    std::memcpy(out.data(), a.data.data(), out.size() * 4);
  } else if (a.dtype == "f8") {
    const double* p = reinterpret_cast<const double*>(a.data.data());
    for (size_t i = 0; i < out.size(); i++) out[i] = (float)p[i];
  } else if (a.dtype == "i4") {
    const int32_t* p = reinterpret_cast<const int32_t*>(a.data.data());
    for (size_t i = 0; i < out.size(); i++) out[i] = (float)p[i];
  } else {
    const int64_t* p = reinterpret_cast<const int64_t*>(a.data.data());
    for (size_t i = 0; i < out.size(); i++) out[i] = (float)p[i];
  }
  return out;
}

std::vector<int32_t> to_i32(const NpyArray& a) {
  std::vector<int32_t> out(a.count());
  if (a.dtype == "i8") {
    const int64_t* p = reinterpret_cast<const int64_t*>(a.data.data());
    for (size_t i = 0; i < out.size(); i++) out[i] = (int32_t)p[i];
  } else if (a.dtype == "i4") {
    std::memcpy(out.data(), a.data.data(), out.size() * 4);
  } else if (a.dtype == "f8") {
    const double* p = reinterpret_cast<const double*>(a.data.data());
    for (size_t i = 0; i < out.size(); i++) out[i] = (int32_t)p[i];
  } else {
    const float* p = reinterpret_cast<const float*>(a.data.data());
    for (size_t i = 0; i < out.size(); i++) out[i] = (int32_t)p[i];
  }
  return out;
}

// ---------------------------------------------------------------------------
// dataset: ingest-time normalization + fixed point count (matches
// sug_tpu.data.datasets.PointCloudDataset semantics)
// ---------------------------------------------------------------------------

struct Dataset {
  int64_t num_clouds = 0;
  int num_points = 0;
  std::vector<float> pts;       // (M, num_points, 3) contiguous
  std::vector<int32_t> labels;  // (M,)
  std::vector<std::vector<int32_t>> class_indices;  // 10 classes
};

void normalize_cloud(float* p, int n) {
  double cx = 0, cy = 0, cz = 0;
  for (int i = 0; i < n; i++) { cx += p[3*i]; cy += p[3*i+1]; cz += p[3*i+2]; }
  cx /= n; cy /= n; cz /= n;
  double max_norm = 1e-12;
  for (int i = 0; i < n; i++) {
    p[3*i] -= (float)cx; p[3*i+1] -= (float)cy; p[3*i+2] -= (float)cz;
    double nn = std::sqrt((double)p[3*i]*p[3*i] + (double)p[3*i+1]*p[3*i+1] +
                          (double)p[3*i+2]*p[3*i+2]);
    if (nn > max_norm) max_norm = nn;
  }
  float inv = (float)(1.0 / max_norm);
  for (int i = 0; i < 3 * n; i++) p[i] *= inv;
}

void rotate_x(float* p, int n, float angle) {
  float c = std::cos(angle), s = std::sin(angle);
  for (int i = 0; i < n; i++) {
    float y = p[3*i+1], z = p[3*i+2];
    // pc @ R_x (right-multiplication, matching data_utils.rotate_shape)
    p[3*i+1] = y * c + z * s;
    p[3*i+2] = -y * s + z * c;
  }
}

}  // namespace

extern "C" {

void* sug_dataset_load(const char* pts_path, const char* label_path,
                       int num_points, int fixed_x_rotation, unsigned seed) {
  NpyArray pts_npy, lbl_npy;
  if (!parse_npy(pts_path, &pts_npy) || !parse_npy(label_path, &lbl_npy)) {
    return nullptr;
  }
  if (pts_npy.shape.size() != 3) return nullptr;
  int64_t M = pts_npy.shape[0];
  int64_t N_raw = pts_npy.shape[1];
  int64_t C = pts_npy.shape[2];
  if (C < 3) return nullptr;

  std::vector<float> raw = to_f32(pts_npy);
  auto* ds = new Dataset();
  ds->num_clouds = M;
  ds->num_points = num_points;
  ds->labels = to_i32(lbl_npy);
  ds->pts.assign((size_t)M * num_points * 3, 0.0f);
  ds->class_indices.resize(10);

  std::mt19937 rng(seed);
  std::vector<float> cloud((size_t)N_raw * 3);
  std::vector<int32_t> perm(N_raw);
  for (int64_t m = 0; m < M; m++) {
    // drop extra channels (ScanNet dumps carry >3 dims)
    for (int64_t i = 0; i < N_raw; i++)
      for (int64_t c = 0; c < 3; c++)
        cloud[3*i + c] = raw[(m * N_raw + i) * C + c];
    normalize_cloud(cloud.data(), (int)N_raw);
    if (fixed_x_rotation) rotate_x(cloud.data(), (int)N_raw, -1.5707963f);

    float* dst = &ds->pts[(size_t)m * num_points * 3];
    if (N_raw >= num_points) {
      if (N_raw == num_points) {
        std::memcpy(dst, cloud.data(), (size_t)num_points * 3 * 4);
      } else {
        for (int64_t i = 0; i < N_raw; i++) perm[i] = (int32_t)i;
        std::shuffle(perm.begin(), perm.end(), rng);
        for (int i = 0; i < num_points; i++)
          std::memcpy(dst + 3*i, &cloud[3*perm[i]], 12);
      }
    } else {
      std::memcpy(dst, cloud.data(), (size_t)N_raw * 3 * 4);  // zero-padded tail
    }
    int32_t lbl = ds->labels[m];
    if (lbl >= 0 && lbl < 10) ds->class_indices[lbl].push_back((int32_t)m);
  }
  return ds;
}

int64_t sug_dataset_size(void* h) { return static_cast<Dataset*>(h)->num_clouds; }
int sug_dataset_num_points(void* h) { return static_cast<Dataset*>(h)->num_points; }

void sug_dataset_class_counts(void* h, int32_t* out10) {
  auto* ds = static_cast<Dataset*>(h);
  for (int c = 0; c < 10; c++) out10[c] = (int32_t)ds->class_indices[c].size();
}

void sug_dataset_get_all(void* h, float* out_pts, int32_t* out_labels) {
  auto* ds = static_cast<Dataset*>(h);
  std::memcpy(out_pts, ds->pts.data(), ds->pts.size() * 4);
  std::memcpy(out_labels, ds->labels.data(), ds->labels.size() * 4);
}

void sug_dataset_destroy(void* h) { delete static_cast<Dataset*>(h); }

// Adopt arrays already preprocessed on the Python side (normalize/rotate/fit
// done by PointCloudDataset.__init__) — lets split subsets from the train-time
// splitter (which have no on-disk npy of their own) use the native batch
// assembly + prefetch thread.
void* sug_dataset_from_arrays(const float* pts, const int32_t* labels,
                              int64_t M, int num_points) {
  auto* ds = new Dataset();
  ds->num_clouds = M;
  ds->num_points = num_points;
  ds->pts.assign(pts, pts + (size_t)M * num_points * 3);
  ds->labels.assign(labels, labels + M);
  ds->class_indices.resize(10);
  for (int64_t m = 0; m < M; m++) {
    int32_t lbl = ds->labels[m];
    if (lbl >= 0 && lbl < 10) ds->class_indices[lbl].push_back((int32_t)m);
  }
  return ds;
}

// ---------------------------------------------------------------------------
// prefetching batch iterator
// ---------------------------------------------------------------------------

struct Iter {
  Dataset* ds;
  int batch_size;
  bool shuffle, drop_last, class_balance;
  int class_per_batch;
  unsigned seed = 0;

  std::vector<int32_t> order;
  int n_batches = 0;
  std::atomic<int> cursor{0};

  // single-slot prefetch buffer filled by a worker thread
  std::vector<float> buf_pts;
  std::vector<int32_t> buf_labels;
  bool buf_full = false;
  bool epoch_done = false;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::thread worker;
  std::atomic<bool> stop{false};

  void assemble(int b) {
    for (int i = 0; i < batch_size; i++) {
      int32_t idx = order[(size_t)b * batch_size + i];
      std::memcpy(&buf_pts[(size_t)i * ds->num_points * 3],
                  &ds->pts[(size_t)idx * ds->num_points * 3],
                  (size_t)ds->num_points * 3 * 4);
      buf_labels[i] = ds->labels[idx];
    }
  }

  void run() {
    while (!stop.load()) {
      int b = cursor.load();
      if (b >= n_batches) {
        std::unique_lock<std::mutex> lk(mu);
        epoch_done = true;
        cv_full.notify_all();
        cv_empty.wait(lk, [&] { return stop.load() || !epoch_done; });
        continue;
      }
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_empty.wait(lk, [&] { return stop.load() || !buf_full; });
        if (stop.load()) return;
      }
      assemble(b);
      cursor.fetch_add(1);
      {
        std::lock_guard<std::mutex> lk(mu);
        buf_full = true;
      }
      cv_full.notify_all();
    }
  }

  void build_order(int epoch) {
    // epoch-DETERMINED order (like the Python BatchIterator's (seed, epoch)
    // rng): a resumed run replays the uninterrupted run's shuffles, and
    // mid-epoch resets (the DG loop abandons the longer zipped iterator)
    // cannot advance future epochs' streams.
    std::seed_seq seq{seed, (unsigned)epoch};
    std::mt19937 erng(seq);
    order.clear();
    int64_t M = ds->num_clouds;
    if (class_balance) {
      // reference Sampler semantics (utils/train_utils.py:65-82)
      std::vector<int> nonempty;
      for (int c = 0; c < 10; c++)
        if (!ds->class_indices[c].empty()) nonempty.push_back(c);
      std::shuffle(nonempty.begin(), nonempty.end(), erng);
      int k = std::min((int)nonempty.size(), class_per_batch);
      std::vector<int> chosen(nonempty.begin(), nonempty.begin() + k);
      n_batches = (int)(M / batch_size);
      order.resize((size_t)n_batches * batch_size);
      for (auto& o : order) {
        int c = chosen[erng() % chosen.size()];
        const auto& pool = ds->class_indices[c];
        o = pool[erng() % pool.size()];
      }
    } else {
      order.resize(M);
      for (int64_t i = 0; i < M; i++) order[i] = (int32_t)i;
      if (shuffle) std::shuffle(order.begin(), order.end(), erng);
      n_batches = drop_last ? (int)(M / batch_size)
                            : (int)((M + batch_size - 1) / batch_size);
      if (!drop_last && M % batch_size) {
        // wrap the tail so batches stay fixed-shape
        for (int64_t i = M; i < (int64_t)n_batches * batch_size; i++)
          order.push_back(order[i % M]);
      }
    }
  }
};

void* sug_iter_create(void* dsh, int batch_size, int shuffle, int drop_last,
                      int class_balance, int class_per_batch, unsigned seed) {
  auto* it = new Iter();
  it->ds = static_cast<Dataset*>(dsh);
  it->batch_size = batch_size;
  it->shuffle = shuffle;
  it->drop_last = drop_last;
  it->class_balance = class_balance;
  it->class_per_batch = class_per_batch;
  it->seed = seed;
  it->buf_pts.resize((size_t)batch_size * it->ds->num_points * 3);
  it->buf_labels.resize(batch_size);
  it->build_order(0);
  it->worker = std::thread([it] { it->run(); });
  return it;
}

int sug_iter_num_batches(void* h) { return static_cast<Iter*>(h)->n_batches; }

// returns 1 and fills the buffers, or 0 at epoch end
int sug_iter_next(void* h, float* out_pts, int32_t* out_labels) {
  auto* it = static_cast<Iter*>(h);
  std::unique_lock<std::mutex> lk(it->mu);
  it->cv_full.wait(lk, [&] { return it->buf_full || it->epoch_done; });
  if (!it->buf_full && it->epoch_done) return 0;
  std::memcpy(out_pts, it->buf_pts.data(), it->buf_pts.size() * 4);
  std::memcpy(out_labels, it->buf_labels.data(), it->buf_labels.size() * 4);
  it->buf_full = false;
  it->cv_empty.notify_all();
  return 1;
}

void sug_iter_reset(void* h, int epoch) {
  // Safe at ANY time, including mid-epoch (the DG loop zips two iterators and
  // abandons the longer one early): the worker may be inside assemble() and
  // reads `order` without the mutex, so quiesce it via stop+join before
  // rebuilding, then restart. One thread spawn per epoch is negligible.
  auto* it = static_cast<Iter*>(h);
  it->stop.store(true);
  {
    std::lock_guard<std::mutex> lk(it->mu);
    it->epoch_done = false;
    it->buf_full = false;
  }
  it->cv_empty.notify_all();
  it->cv_full.notify_all();
  if (it->worker.joinable()) it->worker.join();
  it->stop.store(false);
  it->build_order(epoch);
  it->cursor.store(0);
  it->buf_full = false;
  it->epoch_done = false;
  it->worker = std::thread([it] { it->run(); });
}

void sug_iter_destroy(void* h) {
  auto* it = static_cast<Iter*>(h);
  it->stop.store(true);
  {
    std::lock_guard<std::mutex> lk(it->mu);
    it->epoch_done = false;
    it->buf_full = false;
  }
  it->cv_empty.notify_all();
  it->cv_full.notify_all();
  if (it->worker.joinable()) it->worker.join();
  delete it;
}

}  // extern "C"
