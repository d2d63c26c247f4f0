// ThreadSanitizer stress harness for the native loader.
//
// The concurrency model under test: a Dataset is immutable after
// mpe_dataset_add_file, and mpe_dataset_fill_batch may be called
// concurrently from multiple caller threads (the Python prefetch thread
// overlaps the consumer), each call itself fanning out to an inner
// thread team writing disjoint output ranges. This harness drives that
// pattern hard; build with `make -C native tsan` (-fsanitize=thread)
// and any data race aborts with a TSAN report.
//
// Usage: tsan_stress <hcqt.npy> <annot.npy>

#include <cstdio>
#include <cstdlib>
#include <thread>
#include <vector>

extern "C" {
struct Dataset;
Dataset* mpe_dataset_create(int context, int stride, int target_lo,
                            int target_hi);
long mpe_dataset_add_file(Dataset* ds, const char* hcqt_path,
                          const char* annot_path);
long mpe_dataset_num_windows(const Dataset* ds);
const char* mpe_dataset_error(const Dataset* ds);
int mpe_dataset_fill_batch(const Dataset* ds, const long* indices, long n,
                           float* x_out, float* y_out, int n_threads);
void mpe_dataset_destroy(Dataset* ds);
}

int main(int argc, char** argv) {
  if (argc != 3) {
    std::fprintf(stderr, "usage: %s hcqt.npy annot.npy\n", argv[0]);
    return 2;
  }
  const int context = 75, stride = 1, lo = 24, hi = 96;
  Dataset* ds = mpe_dataset_create(context, stride, lo, hi);
  if (mpe_dataset_add_file(ds, argv[1], argv[2]) < 0) {
    std::fprintf(stderr, "add_file: %s\n", mpe_dataset_error(ds));
    return 1;
  }
  const long total = mpe_dataset_num_windows(ds);
  if (total <= 0) {
    std::fprintf(stderr, "no windows\n");
    return 1;
  }

  const long batch = 16;
  const int callers = 6, rounds = 40, inner_threads = 4;
  const long x_elems = 6L * context * 216, y_elems = hi - lo;

  auto caller = [&](int id) {
    std::vector<long> idx(batch);
    std::vector<float> x(batch * x_elems), y(batch * y_elems);
    unsigned s = 12345u + id;
    for (int r = 0; r < rounds; ++r) {
      for (long b = 0; b < batch; ++b) {
        s = s * 1664525u + 1013904223u;
        idx[b] = s % total;
      }
      if (mpe_dataset_fill_batch(ds, idx.data(), batch, x.data(), y.data(),
                                 inner_threads) != 0) {
        std::fprintf(stderr, "fill_batch failed\n");
        std::exit(1);
      }
    }
  };

  std::vector<std::thread> threads;
  for (int i = 0; i < callers; ++i) threads.emplace_back(caller, i);
  for (auto& t : threads) t.join();
  mpe_dataset_destroy(ds);
  std::printf("tsan_stress OK: %d callers x %d rounds x %d inner threads, "
              "%ld windows\n", callers, rounds, inner_threads, total);
  return 0;
}
