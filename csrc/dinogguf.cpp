// dinogguf: native host-side codec for the dinov2-tpu framework.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the HOST hot
// paths that the reference implements in C/C++ inside ggml (SURVEY.md C17/C23):
//   - fp16 <-> fp32 expansion (GGUF ingest of multi-GB fp16 checkpoints)
//   - block quantize / dequantize for q4_0 / q4_1 / q5_0 / q5_1 / q8_0
//   - unpack-to-int8-codes (the TPU kernel layout, see quant/blocks.py)
//   - row validation (the ggml_validate_row_data equivalent)
//
// Semantics are bit-identical to the numpy implementation in
// dinov2_tpu/quant/blocks.py (enforced by tests/test_native.py); compile with
// -ffp-contract=off so float expression evaluation matches numpy exactly.
//
// Exposed as a plain C ABI consumed via ctypes (dinov2_tpu/utils/native.py).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

#if defined(__x86_64__)
#include <immintrin.h>
#endif

namespace {

constexpr int QK = 32;

enum GgmlType : int {
    T_F32 = 0,
    T_F16 = 1,
    T_Q4_0 = 2,
    T_Q4_1 = 3,
    T_Q5_0 = 6,
    T_Q5_1 = 7,
    T_Q8_0 = 8,
};

// ---- fp16 helpers (IEEE binary16, round-to-nearest-even) -------------------

inline float fp16_to_fp32(uint16_t h) {
#if defined(__F16C__)
    return _cvtsh_ss(h);
#else
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (mant == 0) {
            bits = sign;
        } else {  // subnormal
            exp = 127 - 15 + 1;
            while (!(mant & 0x400)) { mant <<= 1; --exp; }
            mant &= 0x3FF;
            bits = sign | (exp << 23) | (mant << 13);
        }
    } else if (exp == 0x1F) {
        bits = sign | 0x7F800000u | (mant << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float f;
    std::memcpy(&f, &bits, 4);
    return f;
#endif
}

inline uint16_t fp32_to_fp16(float f) {
#if defined(__F16C__)
    return _cvtss_sh(f, _MM_FROUND_TO_NEAREST_INT);
#else
    uint32_t bits;
    std::memcpy(&bits, &f, 4);
    uint32_t sign = (bits >> 16) & 0x8000;
    int32_t exp = (int32_t)((bits >> 23) & 0xFF) - 127 + 15;
    uint32_t mant = bits & 0x7FFFFF;
    if (((bits >> 23) & 0xFF) == 0xFF) return (uint16_t)(sign | 0x7C00 | (mant ? 0x200 : 0));
    if (exp >= 0x1F) return (uint16_t)(sign | 0x7C00);
    if (exp <= 0) {
        if (exp < -10) return (uint16_t)sign;
        mant |= 0x800000;
        int shift = 14 - exp;
        uint32_t q = mant >> shift;
        uint32_t rem = mant & ((1u << shift) - 1);
        uint32_t half = 1u << (shift - 1);
        if (rem > half || (rem == half && (q & 1))) ++q;
        return (uint16_t)(sign | q);
    }
    uint32_t q = mant >> 13;
    uint32_t rem = mant & 0x1FFF;
    if (rem > 0x1000 || (rem == 0x1000 && (q & 1))) ++q;
    uint32_t out = sign | ((uint32_t)exp << 10) | q;
    if (q == 0x400) out = sign | ((uint32_t)(exp + 1) << 10);  // mant overflow
    return (uint16_t)out;
#endif
}

// ---- block structs (packed, match quant/blocks.py dtypes) ------------------

#pragma pack(push, 1)
struct BlockQ4_0 { uint16_t d; uint8_t qs[16]; };
struct BlockQ4_1 { uint16_t d; uint16_t m; uint8_t qs[16]; };
struct BlockQ5_0 { uint16_t d; uint32_t qh; uint8_t qs[16]; };
struct BlockQ5_1 { uint16_t d; uint16_t m; uint32_t qh; uint8_t qs[16]; };
struct BlockQ8_0 { uint16_t d; int8_t qs[32]; };
#pragma pack(pop)

static_assert(sizeof(BlockQ4_0) == 18);
static_assert(sizeof(BlockQ4_1) == 20);
static_assert(sizeof(BlockQ5_0) == 22);
static_assert(sizeof(BlockQ5_1) == 24);
static_assert(sizeof(BlockQ8_0) == 34);

inline int64_t block_bytes(int type) {
    switch (type) {
        case T_Q4_0: return sizeof(BlockQ4_0);
        case T_Q4_1: return sizeof(BlockQ4_1);
        case T_Q5_0: return sizeof(BlockQ5_0);
        case T_Q5_1: return sizeof(BlockQ5_1);
        case T_Q8_0: return sizeof(BlockQ8_0);
        default: return -1;
    }
}

// ---- per-block quantizers (ggml reference semantics) -----------------------

inline void q4_0_block(const float* x, BlockQ4_0* b) {
    float amax = 0.f, maxv = 0.f;
    for (int i = 0; i < QK; ++i) {
        if (std::fabs(x[i]) > amax) { amax = std::fabs(x[i]); maxv = x[i]; }
    }
    float d = maxv / -8.f;
    float id = d ? 1.f / d : 0.f;
    b->d = fp32_to_fp16(d);
    for (int j = 0; j < 16; ++j) {
        int lo = std::min(15, (int)(x[j] * id + 8.5f));
        int hi = std::min(15, (int)(x[16 + j] * id + 8.5f));
        b->qs[j] = (uint8_t)((lo & 0xF) | ((hi & 0xF) << 4));
    }
}

inline void q4_1_block(const float* x, BlockQ4_1* b) {
    float mn = x[0], mx = x[0];
    for (int i = 1; i < QK; ++i) { mn = std::min(mn, x[i]); mx = std::max(mx, x[i]); }
    float d = (mx - mn) / 15.f;
    float id = d ? 1.f / d : 0.f;
    b->d = fp32_to_fp16(d);
    b->m = fp32_to_fp16(mn);
    for (int j = 0; j < 16; ++j) {
        int lo = std::min(15, (int)((x[j] - mn) * id + 0.5f));
        int hi = std::min(15, (int)((x[16 + j] - mn) * id + 0.5f));
        b->qs[j] = (uint8_t)((lo & 0xF) | ((hi & 0xF) << 4));
    }
}

inline void q5_0_block(const float* x, BlockQ5_0* b) {
    float amax = 0.f, maxv = 0.f;
    for (int i = 0; i < QK; ++i) {
        if (std::fabs(x[i]) > amax) { amax = std::fabs(x[i]); maxv = x[i]; }
    }
    float d = maxv / -16.f;
    float id = d ? 1.f / d : 0.f;
    b->d = fp32_to_fp16(d);
    uint32_t qh = 0;
    for (int j = 0; j < 16; ++j) {
        int lo = std::min(31, (int)(x[j] * id + 16.5f));
        int hi = std::min(31, (int)(x[16 + j] * id + 16.5f));
        b->qs[j] = (uint8_t)((lo & 0xF) | ((hi & 0xF) << 4));
        qh |= (uint32_t)((lo & 0x10) >> 4) << j;
        qh |= (uint32_t)((hi & 0x10) >> 4) << (j + 16);
    }
    b->qh = qh;
}

inline void q5_1_block(const float* x, BlockQ5_1* b) {
    float mn = x[0], mx = x[0];
    for (int i = 1; i < QK; ++i) { mn = std::min(mn, x[i]); mx = std::max(mx, x[i]); }
    float d = (mx - mn) / 31.f;
    float id = d ? 1.f / d : 0.f;
    b->d = fp32_to_fp16(d);
    b->m = fp32_to_fp16(mn);
    uint32_t qh = 0;
    for (int j = 0; j < 16; ++j) {
        int lo = std::min(31, (int)((x[j] - mn) * id + 0.5f));
        int hi = std::min(31, (int)((x[16 + j] - mn) * id + 0.5f));
        b->qs[j] = (uint8_t)((lo & 0xF) | ((hi & 0xF) << 4));
        qh |= (uint32_t)((lo & 0x10) >> 4) << j;
        qh |= (uint32_t)((hi & 0x10) >> 4) << (j + 16);
    }
    b->qh = qh;
}

inline void q8_0_block(const float* x, BlockQ8_0* b) {
    float amax = 0.f;
    for (int i = 0; i < QK; ++i) amax = std::max(amax, std::fabs(x[i]));
    float d = amax / 127.f;
    float id = d ? 1.f / d : 0.f;
    b->d = fp32_to_fp16(d);
    for (int i = 0; i < QK; ++i) b->qs[i] = (int8_t)std::roundf(x[i] * id);
}

// ---- per-block dequantizers -------------------------------------------------

inline void q4_0_deq(const BlockQ4_0* b, float* y) {
    float d = fp16_to_fp32(b->d);
    for (int j = 0; j < 16; ++j) {
        y[j] = ((b->qs[j] & 0xF) - 8) * d;
        y[16 + j] = ((b->qs[j] >> 4) - 8) * d;
    }
}

inline void q4_1_deq(const BlockQ4_1* b, float* y) {
    float d = fp16_to_fp32(b->d), m = fp16_to_fp32(b->m);
    for (int j = 0; j < 16; ++j) {
        y[j] = (b->qs[j] & 0xF) * d + m;
        y[16 + j] = (b->qs[j] >> 4) * d + m;
    }
}

inline void q5_0_deq(const BlockQ5_0* b, float* y) {
    float d = fp16_to_fp32(b->d);
    for (int j = 0; j < 16; ++j) {
        int lo = (b->qs[j] & 0xF) | (((b->qh >> j) & 1) << 4);
        int hi = (b->qs[j] >> 4) | (((b->qh >> (j + 16)) & 1) << 4);
        y[j] = (lo - 16) * d;
        y[16 + j] = (hi - 16) * d;
    }
}

inline void q5_1_deq(const BlockQ5_1* b, float* y) {
    float d = fp16_to_fp32(b->d), m = fp16_to_fp32(b->m);
    for (int j = 0; j < 16; ++j) {
        int lo = (b->qs[j] & 0xF) | (((b->qh >> j) & 1) << 4);
        int hi = (b->qs[j] >> 4) | (((b->qh >> (j + 16)) & 1) << 4);
        y[j] = lo * d + m;
        y[16 + j] = hi * d + m;
    }
}

inline void q8_0_deq(const BlockQ8_0* b, float* y) {
    float d = fp16_to_fp32(b->d);
    for (int i = 0; i < QK; ++i) y[i] = b->qs[i] * d;
}

}  // namespace

extern "C" {

void dg_fp16_to_fp32(const uint16_t* src, float* dst, int64_t n) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) dst[i] = fp16_to_fp32(src[i]);
}

void dg_fp32_to_fp16(const float* src, uint16_t* dst, int64_t n) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) dst[i] = fp32_to_fp16(src[i]);
}

// src: rows*cols floats; dst: packed blocks. Returns bytes written, or -1.
int64_t dg_quantize(int type, const float* src, uint8_t* dst,
                    int64_t rows, int64_t cols) {
    if (cols % QK) return -1;
    int64_t nb = cols / QK;
    int64_t bb = block_bytes(type);
    if (bb < 0) return -1;
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < rows; ++r) {
        const float* x = src + r * cols;
        uint8_t* out = dst + r * nb * bb;
        for (int64_t b = 0; b < nb; ++b, x += QK, out += bb) {
            switch (type) {
                case T_Q4_0: q4_0_block(x, (BlockQ4_0*)out); break;
                case T_Q4_1: q4_1_block(x, (BlockQ4_1*)out); break;
                case T_Q5_0: q5_0_block(x, (BlockQ5_0*)out); break;
                case T_Q5_1: q5_1_block(x, (BlockQ5_1*)out); break;
                case T_Q8_0: q8_0_block(x, (BlockQ8_0*)out); break;
            }
        }
    }
    return rows * nb * bb;
}

int dg_dequantize(int type, const uint8_t* src, float* dst,
                  int64_t rows, int64_t cols) {
    if (cols % QK) return -1;
    int64_t nb = cols / QK;
    int64_t bb = block_bytes(type);
    if (bb < 0) return -1;
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < rows; ++r) {
        const uint8_t* in = src + r * nb * bb;
        float* y = dst + r * cols;
        for (int64_t b = 0; b < nb; ++b, in += bb, y += QK) {
            switch (type) {
                case T_Q4_0: q4_0_deq((const BlockQ4_0*)in, y); break;
                case T_Q4_1: q4_1_deq((const BlockQ4_1*)in, y); break;
                case T_Q5_0: q5_0_deq((const BlockQ5_0*)in, y); break;
                case T_Q5_1: q5_1_deq((const BlockQ5_1*)in, y); break;
                case T_Q8_0: q8_0_deq((const BlockQ8_0*)in, y); break;
            }
        }
    }
    return 0;
}

// Unpack to TPU-kernel SoA: codes int8 (rows, cols), d f32 (rows, cols/32),
// m f32 (rows, cols/32) or nullptr for symmetric formats.
int dg_unpack_codes(int type, const uint8_t* src, int8_t* codes,
                    float* d, float* m, int64_t rows, int64_t cols) {
    if (cols % QK) return -1;
    int64_t nb = cols / QK;
    int64_t bb = block_bytes(type);
    if (bb < 0) return -1;
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < rows; ++r) {
        const uint8_t* in = src + r * nb * bb;
        for (int64_t b = 0; b < nb; ++b, in += bb) {
            int8_t* c = codes + r * cols + b * QK;
            int64_t bi = r * nb + b;
            switch (type) {
                case T_Q4_0: {
                    auto* blk = (const BlockQ4_0*)in;
                    d[bi] = fp16_to_fp32(blk->d);
                    for (int j = 0; j < 16; ++j) {
                        c[j] = (int8_t)((blk->qs[j] & 0xF) - 8);
                        c[16 + j] = (int8_t)((blk->qs[j] >> 4) - 8);
                    }
                    break;
                }
                case T_Q4_1: {
                    auto* blk = (const BlockQ4_1*)in;
                    d[bi] = fp16_to_fp32(blk->d);
                    m[bi] = fp16_to_fp32(blk->m);
                    for (int j = 0; j < 16; ++j) {
                        c[j] = (int8_t)(blk->qs[j] & 0xF);
                        c[16 + j] = (int8_t)(blk->qs[j] >> 4);
                    }
                    break;
                }
                case T_Q5_0: {
                    auto* blk = (const BlockQ5_0*)in;
                    d[bi] = fp16_to_fp32(blk->d);
                    for (int j = 0; j < 16; ++j) {
                        int lo = (blk->qs[j] & 0xF) | (((blk->qh >> j) & 1) << 4);
                        int hi = (blk->qs[j] >> 4) | (((blk->qh >> (j + 16)) & 1) << 4);
                        c[j] = (int8_t)(lo - 16);
                        c[16 + j] = (int8_t)(hi - 16);
                    }
                    break;
                }
                case T_Q5_1: {
                    auto* blk = (const BlockQ5_1*)in;
                    d[bi] = fp16_to_fp32(blk->d);
                    m[bi] = fp16_to_fp32(blk->m);
                    for (int j = 0; j < 16; ++j) {
                        c[j] = (int8_t)((blk->qs[j] & 0xF) | (((blk->qh >> j) & 1) << 4));
                        c[16 + j] = (int8_t)((blk->qs[j] >> 4) | (((blk->qh >> (j + 16)) & 1) << 4));
                    }
                    break;
                }
                case T_Q8_0: {
                    auto* blk = (const BlockQ8_0*)in;
                    d[bi] = fp16_to_fp32(blk->d);
                    std::memcpy(c, blk->qs, QK);
                    break;
                }
            }
        }
    }
    return 0;
}

// ggml_validate_row_data equivalent: finite fp16 scales/mins.
int dg_validate(int type, const uint8_t* src, int64_t nbytes) {
    int64_t bb = block_bytes(type);
    if (bb < 0 || nbytes % bb) return 0;
    int64_t n = nbytes / bb;
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t* in = src + i * bb;
        uint16_t dh;
        std::memcpy(&dh, in, 2);
        if (!std::isfinite(fp16_to_fp32(dh))) return 0;
        if (type == T_Q4_1 || type == T_Q5_1) {
            uint16_t mh;
            std::memcpy(&mh, in + 2, 2);
            if (!std::isfinite(fp16_to_fp32(mh))) return 0;
        }
    }
    return 1;
}

}  // extern "C"
