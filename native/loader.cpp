// Async JPEG decode + prefetch pipeline (the framework's native data loader).
//
// Role: the reference loads frames synchronously with PIL/cv2 on the Python
// thread between device steps (tools/video_loading.py:6-20, runner.py:49) —
// at 20+ fps the decode stalls the TPU. This loader decodes ahead on a
// thread pool (libjpeg) into a bounded in-order queue so the host always has
// the next frame ready when the previous device step retires.
//
// C API (ctypes-friendly):
//   void*  loader_create(const char** paths, int n, int threads, int depth);
//   int    loader_next(void* h, unsigned char** data, int* w, int* hgt, int* idx);
//            -> 0 ok, 1 end-of-stream, <0 decode error (frame skipped)
//   void   loader_release(unsigned char* data);
//   void   loader_destroy(void* h);
//
// Build: make -C native   (g++ -O2 -shared -fPIC loader.cpp -ljpeg)

#include <cstdio>   // must precede jpeglib.h (it needs FILE declared)
#include <cstddef>

#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  unsigned char* data = nullptr;  // RGB8, w*h*3 (malloc'd; freed by caller)
  int w = 0, h = 0;
  bool error = false;
};

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  std::jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* mgr = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  std::longjmp(mgr->jump, 1);
}

bool decode_jpeg_file(const std::string& path, Frame* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    std::free(out->data);
    out->data = nullptr;
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  out->w = static_cast<int>(cinfo.output_width);
  out->h = static_cast<int>(cinfo.output_height);
  const size_t stride = static_cast<size_t>(out->w) * 3;
  out->data = static_cast<unsigned char*>(std::malloc(stride * out->h));
  if (!out->data) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out->data + stride * cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

class Loader {
 public:
  Loader(std::vector<std::string> paths, int threads, int depth)
      : paths_(std::move(paths)), depth_(depth < 1 ? 1 : depth) {
    const int n = threads < 1 ? 1 : threads;
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] { Work(); });
    }
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_space_.notify_all();
    cv_ready_.notify_all();
    for (auto& t : workers_) t.join();
    for (auto& kv : ready_) std::free(kv.second.data);
  }

  // 0 ok, 1 eos, -1 decode error (caller may continue)
  int Next(unsigned char** data, int* w, int* h, int* idx) {
    std::unique_lock<std::mutex> lk(mu_);
    const size_t want = next_out_;
    if (want >= paths_.size()) return 1;
    cv_ready_.wait(lk, [&] { return stop_ || ready_.count(want); });
    if (stop_ && !ready_.count(want)) return 1;
    Frame fr = ready_[want];
    ready_.erase(want);
    ++next_out_;
    cv_space_.notify_all();
    *idx = static_cast<int>(want);
    if (fr.error) {
      *data = nullptr;
      *w = *h = 0;
      return -1;
    }
    *data = fr.data;
    *w = fr.w;
    *h = fr.h;
    return 0;
  }

 private:
  void Work() {
    for (;;) {
      size_t my;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_space_.wait(lk, [&] {
          return stop_ ||
                 (next_in_ < paths_.size() &&
                  next_in_ < next_out_ + static_cast<size_t>(depth_));
        });
        if (stop_ || next_in_ >= paths_.size()) return;
        my = next_in_++;
      }
      Frame fr;
      fr.error = !decode_jpeg_file(paths_[my], &fr);
      {
        std::lock_guard<std::mutex> lk(mu_);
        ready_[my] = fr;
      }
      cv_ready_.notify_all();
    }
  }

  std::vector<std::string> paths_;
  const int depth_;
  std::vector<std::thread> workers_;
  std::mutex mu_;
  std::condition_variable cv_space_, cv_ready_;
  std::map<size_t, Frame> ready_;
  size_t next_in_ = 0;
  size_t next_out_ = 0;
  bool stop_ = false;
};

}  // namespace

extern "C" {

void* loader_create(const char** paths, int n, int threads, int depth) {
  std::vector<std::string> v;
  v.reserve(n);
  for (int i = 0; i < n; ++i) v.emplace_back(paths[i]);
  return new Loader(std::move(v), threads, depth);
}

int loader_next(void* handle, unsigned char** data, int* w, int* h, int* idx) {
  return static_cast<Loader*>(handle)->Next(data, w, h, idx);
}

void loader_release(unsigned char* data) { std::free(data); }

void loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

}  // extern "C"
