// Native host-side data-path kernels: mask morphology, edge-band ray
// sampling, row gathers.
//
// The reference's data path runs cv2.erode/dilate + numpy fancy-indexing in
// Python dataloader workers (`utils/sampler.py` in taconite/IntrinsicAvatar).
// Here the per-step hot loop (morphology over a ~1M-pixel mask + 4096-row
// gathers) is a small C++ library loaded via ctypes and driven by a
// prefetching thread, keeping the TPU feed off the Python interpreter.
//
// Build: g++ -O3 -march=native -shared -fPIC ray_sampler.cpp -o libraysampler.so

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Separable square-kernel erosion/dilation of a binary mask (uint8 0/1).
// Two passes (rows then columns) of running min/max over window k.
static void pass_minmax(const uint8_t* src, uint8_t* dst, int H, int W,
                        int k, bool is_max, bool rows) {
    int r = k / 2;
    int outer = rows ? H : W;
    int inner = rows ? W : H;
    for (int o = 0; o < outer; ++o) {
        for (int i = 0; i < inner; ++i) {
            int lo = std::max(0, i - r);
            int hi = std::min(inner - 1, i + k - 1 - r);
            uint8_t v = is_max ? 0 : 1;
            for (int j = lo; j <= hi; ++j) {
                uint8_t s = rows ? src[o * W + j] : src[j * W + o];
                if (is_max) { if (s > v) v = s; }
                else        { if (s < v) v = s; }
            }
            if (rows) dst[o * W + i] = v; else dst[i * W + o] = v;
        }
    }
}

void erode_dilate_u8(const uint8_t* mask, int H, int W, int k,
                     uint8_t* eroded, uint8_t* dilated, uint8_t* scratch) {
    pass_minmax(mask, scratch, H, W, k, false, true);
    pass_minmax(scratch, eroded, H, W, k, false, false);
    pass_minmax(mask, scratch, H, W, k, true, true);
    pass_minmax(scratch, dilated, H, W, k, true, false);
}

// xorshift64* PRNG
static inline uint64_t xs(uint64_t* s) {
    uint64_t x = *s;
    x ^= x >> 12; x ^= x << 25; x ^= x >> 27;
    *s = x;
    return x * 0x2545F4914F6CDD1DULL;
}

// EdgeSampler (`utils/sampler.py:9-52` semantics): n_mask indices uniform
// over fg pixels, n_edge over the dilate-erode band, n_rand over all pixels.
// Returns the number of indices written (n_mask+n_edge+n_rand).
int edge_sample(const uint8_t* mask, const uint8_t* eroded,
                const uint8_t* dilated, int HW,
                int n_mask, int n_edge, int n_rand,
                uint64_t seed, int32_t* out_idx,
                int32_t* fg_buf, int32_t* edge_buf) {
    int n_fg = 0, n_eb = 0;
    for (int i = 0; i < HW; ++i) {
        if (mask[i]) fg_buf[n_fg++] = i;
        if (dilated[i] && !eroded[i]) edge_buf[n_eb++] = i;
    }
    uint64_t s = seed ? seed : 0x9E3779B97F4A7C15ULL;
    int w = 0;
    for (int i = 0; i < n_mask; ++i)
        out_idx[w++] = n_fg ? fg_buf[xs(&s) % n_fg] : (int32_t)(xs(&s) % HW);
    for (int i = 0; i < n_edge; ++i)
        out_idx[w++] = n_eb ? edge_buf[xs(&s) % n_eb] : (int32_t)(xs(&s) % HW);
    for (int i = 0; i < n_rand; ++i)
        out_idx[w++] = (int32_t)(xs(&s) % HW);
    return w;
}

// Gather rows: dst[i] = src[idx[i]] over [n_rows, n_cols] float32.
void gather_rows_f32(const float* src, int64_t n_rows, int64_t n_cols,
                     const int32_t* idx, int64_t n_idx, float* dst) {
    for (int64_t i = 0; i < n_idx; ++i) {
        std::memcpy(dst + i * n_cols, src + (int64_t)idx[i] * n_cols,
                    sizeof(float) * n_cols);
    }
}

}  // extern "C"
