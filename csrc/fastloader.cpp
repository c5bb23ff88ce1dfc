// Native batched image decode + resize for the data loader.
//
// TPU-native framework runtime component (the compute path is XLA/Mosaic;
// this is the host-IO side): decodes a batch of image files and resizes
// them into one preallocated uint8 NHWC buffer in a single C++ call,
// avoiding per-sample Python dispatch and releasing the GIL for the whole
// batch. Used by vit_ssl_tpu/data/native.py via ctypes; the loader falls
// back to the cv2-python path when the shared library is absent.
//
// Build: make -C csrc   (links system OpenCV imgcodecs/imgproc/core)

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include <atomic>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Decode paths[i] (any OpenCV-supported format), convert BGR->RGB, resize
// to (out_h, out_w) and write into out[i * out_h * out_w * 3].
// Returns the number of successfully decoded images; failed slots are
// zero-filled and reported via ok[i] = 0.
int vitssl_decode_batch(const char** paths, int n, int out_h, int out_w,
                        unsigned char* out, unsigned char* ok,
                        int num_threads) {
  const size_t stride = static_cast<size_t>(out_h) * out_w * 3;
  std::atomic<int> next{0};
  std::atomic<int> succeeded{0};

  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      cv::Mat img = cv::imread(paths[i], cv::IMREAD_COLOR);
      unsigned char* dst = out + static_cast<size_t>(i) * stride;
      if (img.empty()) {
        std::memset(dst, 0, stride);
        ok[i] = 0;
        continue;
      }
      cv::Mat rgb;
      cv::cvtColor(img, rgb, cv::COLOR_BGR2RGB);
      if (rgb.rows != out_h || rgb.cols != out_w) {
        cv::Mat resized;
        const int interp = (out_h < rgb.rows || out_w < rgb.cols)
                               ? cv::INTER_AREA
                               : cv::INTER_LINEAR;
        cv::resize(rgb, resized, cv::Size(out_w, out_h), 0, 0, interp);
        rgb = resized;
      }
      std::memcpy(dst, rgb.data, stride);
      ok[i] = 1;
      succeeded.fetch_add(1);
    }
  };

  int threads = num_threads > 0 ? num_threads : 1;
  if (threads <= 1 || n <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    const int count = std::min(threads, n);
    pool.reserve(count);
    for (int t = 0; t < count; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return succeeded.load();
}

}  // extern "C"
