// Shared helpers for the native host runtime.
#pragma once

#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

namespace vrt {

// simple static fan-out: batch items >> threads
template <typename Fn>
void parallel_for(int n, int n_threads, Fn fn) {
  n_threads = std::max(1, std::min(n_threads, n));
  if (n_threads == 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next(0);
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    threads.emplace_back([&] {
      int i;
      while ((i = next.fetch_add(1)) < n) fn(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace vrt
