// Threaded host-side batch assembly for the Criteo npy loader.
//
// The per-step host work of the real-data path is: slice B rows of the
// dense [N, 13] f32 / sparse [N, 26] i32 / labels [N, 1] i32 arrays,
// transpose sparse to the [F, B, 1] padded layout, and (optionally)
// gather rows by a shuffled index order. numpy does this single-threaded
// with an extra transpose copy; this stager does the gather + transpose
// in one parallel pass over worker threads, writing into caller-owned
// output buffers (which the Python side hands straight to device_put).
//
// ref role: the reference delegates its heavy data plumbing to native
// code as well (FBGEMM ops for jagged manipulation; C++ datapipes
// upstream); this is the TPU build's equivalent for the only
// host-bound stage of the Criteo pipeline.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Assemble one batch.
//   dense_in  [num_rows, dense_dim] f32 (full table)
//   sparse_in [num_rows, num_feats] i32
//   labels_in [num_rows] i32
//   order     [batch] i64 row indices to gather (may be nullptr for the
//             contiguous range starting at `start`)
//   outputs: dense_out [batch, dense_dim] f32,
//            sparse_out [num_feats, batch] i32  (transposed!),
//            labels_out [batch] f32
void stage_batch(const float* dense_in, const int32_t* sparse_in,
                 const int32_t* labels_in, const int64_t* order,
                 int64_t start, int64_t batch, int32_t dense_dim,
                 int32_t num_feats, float* dense_out, int32_t* sparse_out,
                 float* labels_out, int32_t num_threads) {
  if (num_threads < 1) num_threads = 1;
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      const int64_t src = order ? order[b] : (start + b);
      std::memcpy(dense_out + b * dense_dim, dense_in + src * dense_dim,
                  sizeof(float) * dense_dim);
      const int32_t* srow = sparse_in + src * num_feats;
      for (int32_t f = 0; f < num_feats; ++f) {
        sparse_out[static_cast<int64_t>(f) * batch + b] = srow[f];
      }
      labels_out[b] = static_cast<float>(labels_in[src]);
    }
  };
  if (num_threads == 1 || batch < 2 * num_threads) {
    worker(0, batch);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (batch + num_threads - 1) / num_threads;
  for (int32_t t = 0; t < num_threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min<int64_t>(batch, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(worker, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
