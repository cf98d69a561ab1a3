// Native asynchronous dataset prefetcher for the TPU SLAM runtime.
//
// The reference's runtime is C++ end to end; in this framework the compute
// path is XLA and the host runtime around it is native where it matters.
// Disk reads + PNG/PGM decode are pure host work that would otherwise
// serialize with Python dispatch, so they run here on a pthread worker
// pool with a lookahead ring buffer: the driver asks for frame i and the
// pool is already decoding i+1..i+depth.
//
// Decoders: 8-bit grayscale PGM (P5) natively; 8-bit PNG (gray, gray+alpha,
// RGB, palette-less) via zlib inflate + standard defiltering, converted to
// grayscale. That covers KITTI (gray PNG), TUM (PNG), EuRoC (PGM-like PNG).
//
// C ABI (ctypes):
//   void* dl_open(const char** paths, int n, int width, int height,
//                 int lookahead, int n_threads);
//   int   dl_get(void* h, int idx, unsigned char* out);  // blocks until ready
//   void  dl_close(void* h);

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Image {
    std::vector<uint8_t> pix;
    int w = 0, h = 0;
    bool ok = false;
};

// ---------------------------------------------------------------- PGM --
bool decode_pgm(const std::vector<uint8_t>& buf, Image* out) {
    if (buf.size() < 10 || buf[0] != 'P' || buf[1] != '5') return false;
    size_t pos = 2;
    auto skip_ws = [&]() {
        while (pos < buf.size()) {
            if (buf[pos] == '#') {
                while (pos < buf.size() && buf[pos] != '\n') pos++;
            } else if (isspace(buf[pos])) {
                pos++;
            } else {
                break;
            }
        }
    };
    auto read_int = [&]() {
        skip_ws();
        long v = 0;
        while (pos < buf.size() && isdigit(buf[pos])) v = v * 10 + (buf[pos++] - '0');
        return v;
    };
    long w = read_int(), h = read_int(), maxv = read_int();
    pos++;  // single whitespace after maxval
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return false;
    if (buf.size() < pos + (size_t)(w * h)) return false;
    out->w = (int)w; out->h = (int)h;
    out->pix.assign(buf.begin() + pos, buf.begin() + pos + w * h);
    out->ok = true;
    return true;
}

// ---------------------------------------------------------------- PNG --
uint32_t rd32(const uint8_t* p) {
    return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
           ((uint32_t)p[2] << 8) | (uint32_t)p[3];
}

int paeth(int a, int b, int c) {
    int p = a + b - c, pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

bool decode_png(const std::vector<uint8_t>& buf, Image* out) {
    static const uint8_t magic[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (buf.size() < 8 || memcmp(buf.data(), magic, 8) != 0) return false;
    size_t pos = 8;
    int w = 0, h = 0, bit_depth = 0, color = -1;
    std::vector<uint8_t> idat;
    while (pos + 8 <= buf.size()) {
        uint32_t len = rd32(&buf[pos]);
        if (pos + 12 + len > buf.size()) break;
        const char* type = (const char*)&buf[pos + 4];
        const uint8_t* data = &buf[pos + 8];
        if (!memcmp(type, "IHDR", 4)) {
            w = rd32(data); h = rd32(data + 4);
            bit_depth = data[8]; color = data[9];
            if (data[12] != 0) return false;  // interlaced unsupported
        } else if (!memcmp(type, "IDAT", 4)) {
            idat.insert(idat.end(), data, data + len);
        } else if (!memcmp(type, "IEND", 4)) {
            break;
        }
        pos += 12 + len;
    }
    if (w <= 0 || h <= 0 || bit_depth != 8) return false;
    int ch;
    switch (color) {
        case 0: ch = 1; break;  // gray
        case 2: ch = 3; break;  // rgb
        case 4: ch = 2; break;  // gray+alpha
        case 6: ch = 4; break;  // rgba
        default: return false;  // palette unsupported
    }
    size_t stride = (size_t)w * ch;
    std::vector<uint8_t> raw((stride + 1) * h);
    uLongf raw_len = raw.size();
    if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK)
        return false;

    std::vector<uint8_t> img(stride * h);
    for (int y = 0; y < h; y++) {
        uint8_t filter = raw[y * (stride + 1)];
        const uint8_t* src = &raw[y * (stride + 1) + 1];
        uint8_t* dst = &img[y * stride];
        const uint8_t* up = y ? &img[(y - 1) * stride] : nullptr;
        for (size_t x = 0; x < stride; x++) {
            int a = x >= (size_t)ch ? dst[x - ch] : 0;
            int b = up ? up[x] : 0;
            int c = (up && x >= (size_t)ch) ? up[x - ch] : 0;
            int v = src[x];
            switch (filter) {
                case 0: break;
                case 1: v += a; break;
                case 2: v += b; break;
                case 3: v += (a + b) / 2; break;
                case 4: v += paeth(a, b, c); break;
                default: return false;
            }
            dst[x] = (uint8_t)v;
        }
    }
    out->w = w; out->h = h;
    out->pix.resize((size_t)w * h);
    if (ch == 1) {
        out->pix = std::move(img);
    } else {
        for (size_t i = 0; i < (size_t)w * h; i++) {
            const uint8_t* p = &img[i * ch];
            if (ch >= 3)
                out->pix[i] = (uint8_t)((299 * p[0] + 587 * p[1] + 114 * p[2]) / 1000);
            else
                out->pix[i] = p[0];  // gray+alpha
        }
    }
    out->ok = true;
    return true;
}

bool load_file(const std::string& path, Image* out) {
    FILE* f = fopen(path.c_str(), "rb");
    if (!f) return false;
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf(n);
    size_t got = fread(buf.data(), 1, n, f);
    fclose(f);
    if ((long)got != n) return false;
    if (decode_png(buf, out)) return true;
    return decode_pgm(buf, out);
}

// ------------------------------------------------------------ loader --
struct Loader {
    std::vector<std::string> paths;
    int width, height, lookahead;
    std::vector<Image> slots;
    std::vector<std::atomic<int>> state;  // 0 empty, 1 in-flight, 2 ready
    std::mutex mu;
    std::condition_variable cv_work, cv_done;
    std::queue<int> work;
    std::vector<std::thread> threads;
    std::atomic<bool> stop{false};
    int next_to_schedule = 0;

    void schedule_upto(int idx) {
        for (; next_to_schedule < (int)paths.size() &&
               next_to_schedule <= idx + lookahead; next_to_schedule++) {
            int expected = 0;
            if (state[next_to_schedule].compare_exchange_strong(expected, 1)) {
                work.push(next_to_schedule);
            }
        }
        cv_work.notify_all();
    }

    void worker() {
        while (true) {
            int idx;
            {
                std::unique_lock<std::mutex> lk(mu);
                cv_work.wait(lk, [&] { return stop || !work.empty(); });
                if (stop) return;
                idx = work.front();
                work.pop();
            }
            Image im;
            load_file(paths[idx], &im);
            // Mutate the awaited condition under the mutex: a dl_get
            // thread that just evaluated its wait predicate must not
            // miss this store+notify, or it blocks forever.
            {
                std::lock_guard<std::mutex> lk(mu);
                slots[idx] = std::move(im);
                state[idx].store(2);
            }
            cv_done.notify_all();
        }
    }
};

}  // namespace

extern "C" {

void* dl_open(const char** paths, int n, int width, int height,
              int lookahead, int n_threads) {
    auto* L = new Loader();
    L->paths.assign(paths, paths + n);
    L->width = width;
    L->height = height;
    L->lookahead = lookahead;
    L->slots.resize(n);
    L->state = std::vector<std::atomic<int>>(n);
    for (auto& s : L->state) s.store(0);
    for (int i = 0; i < n_threads; i++)
        L->threads.emplace_back(&Loader::worker, L);
    {
        std::lock_guard<std::mutex> lk(L->mu);
        L->schedule_upto(0);
    }
    return L;
}

int dl_get(void* h, int idx, unsigned char* out) {
    auto* L = (Loader*)h;
    if (idx < 0 || idx >= (int)L->paths.size()) return -1;
    {
        std::lock_guard<std::mutex> lk(L->mu);
        L->schedule_upto(idx);
    }
    {
        std::unique_lock<std::mutex> lk(L->mu);
        L->cv_done.wait(lk, [&] { return L->state[idx].load() == 2; });
    }
    Image& im = L->slots[idx];
    if (!im.ok || im.w != L->width || im.h != L->height) {
        if (!im.ok) return -2;
        // size mismatch: center-crop/pad to requested size
        int oy = (im.h - L->height) / 2, ox = (im.w - L->width) / 2;
        for (int y = 0; y < L->height; y++)
            for (int x = 0; x < L->width; x++) {
                int sy = y + oy, sx = x + ox;
                out[y * L->width + x] =
                    (sy >= 0 && sy < im.h && sx >= 0 && sx < im.w)
                        ? im.pix[(size_t)sy * im.w + sx] : 0;
            }
        im.pix.clear();
        im.ok = false;  // repeat reads must not re-enter with empty pix
        return 1;
    }
    memcpy(out, im.pix.data(), (size_t)L->width * L->height);
    im.pix.clear();  // free memory once consumed
    im.ok = false;
    return 0;
}

void dl_close(void* h) {
    auto* L = (Loader*)h;
    {
        std::lock_guard<std::mutex> lk(L->mu);
        L->stop = true;
    }
    L->cv_work.notify_all();
    for (auto& t : L->threads) t.join();
    delete L;
}

}  // extern "C"
