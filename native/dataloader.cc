// Native data loader: PNG decode (gray8 / gray16 / rgb->gray) + prefetch pool.
//
// TPU-native equivalent of the reference's image IO path (the reference links
// all of OpenCV for cv::imread in its Examples mains, SURVEY §2.1 row 20).
// The SLAM hot loop consumes one grayscale frame (and optionally one 16-bit
// depth frame) per step; this library decodes them off the critical path with
// a small worker pool and hands zero-copy buffers to Python via ctypes.
//
// Self-contained: zlib for inflate, no other dependencies. Supports
// non-interlaced 8/16-bit grayscale and 8-bit RGB/RGBA PNGs (everything TUM /
// KITTI / EuRoC ship).

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int width = 0;
  int height = 0;
  int channels = 0;   // 1 or 3 (after optional alpha strip)
  int bit_depth = 0;  // 8 or 16
  std::vector<uint8_t> data;  // row-major, big-endian 16-bit as in PNG
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

bool inflate_all(const std::vector<uint8_t>& in, std::vector<uint8_t>& out) {
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  const size_t chunk = 1 << 20;
  int ret = Z_OK;
  while (ret != Z_STREAM_END) {
    size_t old = out.size();
    out.resize(old + chunk);
    zs.next_out = out.data() + old;
    zs.avail_out = chunk;
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    out.resize(old + (chunk - zs.avail_out));
  }
  inflateEnd(&zs);
  return true;
}

bool decode_png(const uint8_t* buf, size_t len, Image& img) {
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 8 || memcmp(buf, sig, 8) != 0) return false;
  size_t pos = 8;
  int color_type = -1, interlace = 0;
  std::vector<uint8_t> idat;
  while (pos + 8 <= len) {
    uint32_t clen = be32(buf + pos);
    const char* ctype = reinterpret_cast<const char*>(buf + pos + 4);
    const uint8_t* cdata = buf + pos + 8;
    if (pos + 12 + clen > len) return false;
    if (memcmp(ctype, "IHDR", 4) == 0) {
      uint32_t w32 = be32(cdata), h32 = be32(cdata + 4);
      // reject non-positive / absurd dims before they drive size_t stride
      // arithmetic from a negative int (corrupt or hostile file)
      if (w32 == 0 || h32 == 0 || w32 > (1u << 15) || h32 > (1u << 15) ||
          uint64_t(w32) * h32 > (1ull << 28))
        return false;
      img.width = static_cast<int>(w32);
      img.height = static_cast<int>(h32);
      img.bit_depth = cdata[8];
      color_type = cdata[9];
      interlace = cdata[12];
      if (interlace != 0) return false;  // no Adam7
    } else if (memcmp(ctype, "IDAT", 4) == 0) {
      idat.insert(idat.end(), cdata, cdata + clen);
    } else if (memcmp(ctype, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + clen;
  }
  int src_ch;
  switch (color_type) {
    case 0: src_ch = 1; break;  // gray
    case 2: src_ch = 3; break;  // rgb
    case 4: src_ch = 2; break;  // gray+alpha
    case 6: src_ch = 4; break;  // rgba
    default: return false;      // palette unsupported
  }
  if (img.bit_depth != 8 && img.bit_depth != 16) return false;

  std::vector<uint8_t> raw;
  if (!inflate_all(idat, raw)) return false;

  const int bpp = src_ch * img.bit_depth / 8;        // bytes per pixel
  const size_t stride = size_t(img.width) * bpp;     // bytes per row
  if (raw.size() < (stride + 1) * size_t(img.height)) return false;

  // Unfilter in place into `recon`.
  std::vector<uint8_t> recon(stride * img.height);
  const uint8_t* src = raw.data();
  for (int y = 0; y < img.height; ++y) {
    uint8_t filter = src[y * (stride + 1)];
    const uint8_t* row = src + y * (stride + 1) + 1;
    uint8_t* out = recon.data() + y * stride;
    const uint8_t* prev = y ? recon.data() + (y - 1) * stride : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(bpp) ? out[x - bpp] : 0;
      int b = prev ? prev[x] : 0;
      int c = (prev && x >= size_t(bpp)) ? prev[x - bpp] : 0;
      int v = row[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return false;
      }
      out[x] = static_cast<uint8_t>(v);
    }
  }

  // Strip alpha / keep channels.
  int dst_ch = (src_ch == 2) ? 1 : (src_ch == 4 ? 3 : src_ch);
  if (dst_ch != src_ch) {
    const int bs = img.bit_depth / 8;
    std::vector<uint8_t> packed(size_t(img.width) * img.height * dst_ch * bs);
    for (size_t px = 0; px < size_t(img.width) * img.height; ++px) {
      memcpy(packed.data() + px * dst_ch * bs,
             recon.data() + px * src_ch * bs, dst_ch * bs);
    }
    recon.swap(packed);
  }
  img.channels = dst_ch;
  img.data.swap(recon);
  return true;
}

bool read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  out.resize(sz);
  size_t rd = fread(out.data(), 1, sz, f);
  fclose(f);
  return rd == size_t(sz);
}

// Decode a file to float32 grayscale (0..255) or depth (raw 16-bit value).
bool load_as_f32(const char* path, std::vector<float>& out, int* w, int* h) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return false;
  Image img;
  if (!decode_png(buf.data(), buf.size(), img)) return false;
  *w = img.width;
  *h = img.height;
  const size_t n = size_t(img.width) * img.height;
  out.resize(n);
  if (img.bit_depth == 8) {
    if (img.channels == 1) {
      for (size_t i = 0; i < n; ++i) out[i] = float(img.data[i]);
    } else {  // rgb -> gray (Rec.601, matches cv::cvtColor weights)
      for (size_t i = 0; i < n; ++i) {
        const uint8_t* p = img.data.data() + i * 3;
        out[i] = 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
      }
    }
  } else {  // 16-bit big-endian (TUM depth)
    for (size_t i = 0; i < n; ++i) {
      const uint8_t* p = img.data.data() + i * 2 * img.channels;
      out[i] = float((uint32_t(p[0]) << 8) | p[1]);
    }
  }
  return true;
}

// --------------------------------------------------------------------------
// Prefetch pool: N worker threads decode a queue of paths into slots.
// --------------------------------------------------------------------------

struct Slot {
  std::vector<float> data;
  int width = 0, height = 0;
  std::atomic<int> state{0};  // 0 empty, 1 queued, 2 ready, 3 failed
};

struct Prefetcher {
  std::vector<std::string> paths;
  std::vector<Slot> slots;
  std::deque<int> work;
  std::mutex mu;
  std::condition_variable cv;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  int window = 0;
  std::atomic<int> next_enqueued{0};

  void worker() {
    for (;;) {
      int idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop.load() || !work.empty(); });
        if (stop.load() && work.empty()) return;
        idx = work.front();
        work.pop_front();
      }
      Slot& s = slots[idx];
      bool ok = load_as_f32(paths[idx].c_str(), s.data, &s.width, &s.height);
      s.state.store(ok ? 2 : 3, std::memory_order_release);
    }
  }

  void ensure_enqueued(int upto) {
    std::lock_guard<std::mutex> lk(mu);
    int start = next_enqueued.load();
    for (int i = start; i <= upto && i < int(paths.size()); ++i) {
      if (slots[i].state.load() == 0) {
        slots[i].state.store(1);
        work.push_back(i);
      }
    }
    if (upto >= start) next_enqueued.store(upto + 1);
    cv.notify_all();
  }
};

}  // namespace

extern "C" {

// One-shot decode. Returns 0 on success; caller provides the output buffer of
// size max_elems floats (use dl_probe to get dimensions first, or a buffer of
// known camera size).
int dl_load_image(const char* path, float* out, int max_elems, int* w, int* h) {
  std::vector<float> tmp;
  if (!load_as_f32(path, tmp, w, h)) return -1;
  if (int(tmp.size()) > max_elems) return -2;
  memcpy(out, tmp.data(), tmp.size() * sizeof(float));
  return 0;
}

void* dl_create(const char** paths, int n_paths, int n_workers, int window) {
  auto* p = new Prefetcher();
  p->paths.assign(paths, paths + n_paths);
  p->slots = std::vector<Slot>(n_paths);
  p->window = window;
  for (int i = 0; i < n_workers; ++i)
    p->workers.emplace_back(&Prefetcher::worker, p);
  p->ensure_enqueued(std::min(window, n_paths - 1));
  return p;
}

// Blocks until frame idx is decoded; copies into out; schedules the window
// ahead. Returns 0 ok / -1 decode failure / -2 buffer too small.
int dl_get(void* handle, int idx, float* out, int max_elems, int* w, int* h) {
  auto* p = static_cast<Prefetcher*>(handle);
  if (idx < 0 || idx >= int(p->paths.size())) return -1;
  Slot& s = p->slots[idx];
  {
    // a consumed (or never-windowed) slot re-enqueues directly, so a
    // repeated dl_get re-decodes instead of returning an empty buffer
    std::lock_guard<std::mutex> lk(p->mu);
    if (s.state.load() == 0) {
      s.state.store(1);
      p->work.push_back(idx);
      p->cv.notify_all();
    }
  }
  p->ensure_enqueued(std::min(idx + p->window, int(p->paths.size()) - 1));
  while (s.state.load(std::memory_order_acquire) < 2)
    std::this_thread::yield();
  if (s.state.load() == 3) return -1;
  if (int(s.data.size()) > max_elems) return -2;
  *w = s.width;
  *h = s.height;
  memcpy(out, s.data.data(), s.data.size() * sizeof(float));
  s.data.clear();
  s.data.shrink_to_fit();
  s.state.store(0, std::memory_order_release);  // consumed -> empty
  return 0;
}

void dl_destroy(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  p->stop.store(true);
  p->cv.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
