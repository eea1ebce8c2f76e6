// dynfu_tpu native data loader: threaded 16-bit PNG depth-frame decoder.
//
// Native-runtime counterpart of the reference's C++ dataset path
// (DynFuApp::loadFiles + cv::imread per frame, src/apps/demo.cpp:39-55,85-90):
// a worker pool decodes depth PNGs ahead of the consumer so the TPU never
// waits on host-side image decode. Exposed as a minimal C ABI consumed from
// Python via ctypes (io/native_loader.py).
//
// Decoding uses libpng directly (16-bit grayscale, network byte order
// swapped to host); frames are delivered strictly in order through a
// fixed-capacity slot ring guarded by a mutex + condvars.

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <chrono>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
    std::vector<uint16_t> data;
    int height = 0;
    int width = 0;
    bool ready = false;
    bool failed = false;
};

// Decode one 16-bit (or 8-bit) grayscale PNG into out. Returns false on error.
bool decode_png(const std::string &path, Frame &out) {
    FILE *fp = std::fopen(path.c_str(), "rb");
    if (!fp) return false;

    png_structp png =
        png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    if (!png) {
        std::fclose(fp);
        return false;
    }
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        std::fclose(fp);
        return false;
    }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        std::fclose(fp);
        return false;
    }

    png_init_io(png, fp);
    png_read_info(png, info);

    png_uint_32 width = png_get_image_width(png, info);
    png_uint_32 height = png_get_image_height(png, info);
    int bit_depth = png_get_bit_depth(png, info);
    int color_type = png_get_color_type(png, info);

    // normalize to single-channel 16-bit
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type & PNG_COLOR_MASK_COLOR) png_set_rgb_to_gray(png, 1, -1, -1);
    if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    if (bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
    if (bit_depth == 16) png_set_swap(png);  // big-endian file -> host LE
    png_read_update_info(png, info);
    bit_depth = png_get_bit_depth(png, info);

    out.height = static_cast<int>(height);
    out.width = static_cast<int>(width);
    out.data.resize(static_cast<size_t>(height) * width);

    std::vector<png_bytep> rows(height);
    std::vector<uint8_t> row8;
    if (bit_depth == 16) {
        for (png_uint_32 y = 0; y < height; ++y)
            rows[y] = reinterpret_cast<png_bytep>(out.data.data() + y * width);
        png_read_image(png, rows.data());
    } else {  // 8-bit fallback: widen after read
        row8.resize(static_cast<size_t>(height) * width);
        for (png_uint_32 y = 0; y < height; ++y) rows[y] = row8.data() + y * width;
        png_read_image(png, rows.data());
        for (size_t i = 0; i < row8.size(); ++i) out.data[i] = row8[i];
    }

    png_read_end(png, nullptr);
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return true;
}

class Loader {
  public:
    Loader(std::vector<std::string> paths, int queue_depth, int n_threads)
        : paths_(std::move(paths)),
          ring_(std::max(queue_depth, 1)),
          next_to_decode_(0),
          stop_(false) {
        int n = std::max(n_threads, 1);
        for (int i = 0; i < n; ++i)
            workers_.emplace_back([this] { work(); });
    }

    ~Loader() {
        {
            std::lock_guard<std::mutex> lk(mu_);
            stop_ = true;
        }
        cv_space_.notify_all();
        cv_ready_.notify_all();
        for (auto &t : workers_) t.join();
    }

    // Copy frame `index` into out (row-major uint16). Blocks until decoded.
    // Returns 0 ok, 1 decode failure, 2 index out of range, 3 buffer
    // small, 4 loader stopped, 5 timeout (watchdog: a stuck worker or a
    // scheduling bug must surface as a diagnosable error, never a hang —
    // a full-suite run once deadlocked here, see work()'s grant order).
    int get(size_t index, uint16_t *out, int *h, int *w, size_t capacity) {
        if (index >= paths_.size()) return 2;
        std::unique_lock<std::mutex> lk(mu_);
        Slot &s = ring_[index % ring_.size()];
        bool ok_pred = cv_ready_.wait_for(lk, std::chrono::seconds(120), [&] {
            return stop_ || (s.index == index && (s.frame.ready || s.frame.failed));
        });
        if (!ok_pred) return 5;
        if (stop_ && !(s.index == index && s.frame.ready)) return 4;
        if (s.frame.failed) {
            // the failure has been DELIVERED: release the slot (leaving it
            // unconsumed would wedge every later claim of this slot)
            s.consumed = true;
            cv_space_.notify_all();
            return 1;
        }
        if (s.frame.data.size() > capacity) return 3;
        *h = s.frame.height;
        *w = s.frame.width;
        std::memcpy(out, s.frame.data.data(),
                    s.frame.data.size() * sizeof(uint16_t));
        s.consumed = true;
        cv_space_.notify_all();
        return 0;
    }

    size_t size() const { return paths_.size(); }

  private:
    struct Slot {
        size_t index = SIZE_MAX;
        Frame frame;
        bool consumed = true;
    };

    void work() {
        for (;;) {
            size_t idx;
            {
                std::unique_lock<std::mutex> lk(mu_);
                if (stop_ || next_to_decode_ >= paths_.size()) return;
                idx = next_to_decode_++;
                Slot &s = ring_[idx % ring_.size()];
                const size_t R = ring_.size();
                // ORDERED slot grant: the slot may only be taken when its
                // occupant is exactly this claim's predecessor (idx - R,
                // consumed). A bare "empty or consumed" predicate lets an
                // unordered condvar wakeup hand the slot to claim idx+R
                // ahead of idx when two workers wait on the same slot
                // (threads > queue_depth) — the consumer then waits for
                // idx forever while idx's worker waits for the consumer:
                // deadlock (observed as a full-suite hang).
                cv_space_.wait(lk, [&] {
                    if (stop_) return true;
                    if (idx < R) return s.index == SIZE_MAX;
                    return s.index == idx - R && s.consumed;
                });
                if (stop_) return;
                s.index = idx;
                s.consumed = false;
                s.frame = Frame{};
            }
            Frame f;
            bool ok = decode_png(paths_[idx], f);
            {
                std::lock_guard<std::mutex> lk(mu_);
                Slot &s = ring_[idx % ring_.size()];
                s.frame = std::move(f);
                s.frame.ready = ok;
                s.frame.failed = !ok;
            }
            cv_ready_.notify_all();
        }
    }

    std::vector<std::string> paths_;
    std::vector<Slot> ring_;
    size_t next_to_decode_;
    bool stop_;
    std::mutex mu_;
    std::condition_variable cv_ready_, cv_space_;
    std::vector<std::thread> workers_;
};

}  // namespace

extern "C" {

void *dfl_open(const char **paths, int n_paths, int queue_depth, int n_threads) {
    std::vector<std::string> p(paths, paths + n_paths);
    return new Loader(std::move(p), queue_depth, n_threads);
}

int dfl_get(void *handle, size_t index, uint16_t *out, int *h, int *w,
            size_t capacity) {
    return static_cast<Loader *>(handle)->get(index, out, h, w, capacity);
}

size_t dfl_size(void *handle) { return static_cast<Loader *>(handle)->size(); }

void dfl_close(void *handle) { delete static_cast<Loader *>(handle); }

// Single-shot decode without a loader (for probing / tests).
int dfl_decode_one(const char *path, uint16_t *out, int *h, int *w,
                   size_t capacity) {
    Frame f;
    if (!decode_png(path, f)) return 1;
    if (f.data.size() > capacity) return 3;
    *h = f.height;
    *w = f.width;
    std::memcpy(out, f.data.data(), f.data.size() * sizeof(uint16_t));
    return 0;
}

}  // extern "C"
