// Native frame decoders for detector raw formats.
//
// TPU-native counterpart of the reference's numba decode kernels
// (libertem/io/dataset/mib.py:400-666 r1/r6/r12/r24,
//  io/dataset/base/decode.py:8-101 byteswap/convert): the host CPU
// must sustain the device-feed rate, so the bit-unpack inner loops are
// C++ compiled with -O3 and called in frame batches via ctypes (one
// call per block, not per tile).
//
// Merlin Medipix RAW (R64) layout (single-chip):
//  * r1:  64 pixels per 8-byte stripe; byte order reversed within the
//         stripe, bit b of a byte -> pixel (8*byte + b).
//  * r6:  one u8 per pixel, pixel order reversed in groups of 8.
//  * r12: one big-endian u16 per pixel, order reversed in groups of 4.
//  * r24: two consecutive r12 sub-frames, MSB 12 bits first.

#include <cstdint>
#include <cstring>

extern "C" {

// inp: (n_frames, n_pix/8) packed bits; out: (n_frames, n_pix) u8
//
// 8 bits expand to 8 output bytes (LSB first) branch-free: spread the
// byte into all 8 lanes of a u64, select bit j in lane j, normalize
// to 0/1 via the +0x7F carry trick — one u64 store per input byte.
void decode_r1(const uint8_t* inp, uint8_t* out,
               int64_t n_frames, int64_t n_pix) {
    const int64_t n_bytes = n_pix / 8;
    const uint64_t SPREAD = 0x0101010101010101ULL;
    const uint64_t SELECT = 0x8040201008040201ULL;
    const uint64_t CARRY = 0x7F7F7F7F7F7F7F7FULL;
    for (int64_t f = 0; f < n_frames; f++) {
        const uint8_t* src = inp + f * n_bytes;
        uint8_t* dst = out + f * n_pix;
        for (int64_t stripe = 0; stripe < n_bytes / 8; stripe++) {
            for (int64_t byte = 0; byte < 8; byte++) {
                const uint64_t v = src[stripe * 8 + (7 - byte)];
                const uint64_t sel = (v * SPREAD) & SELECT;
                const uint64_t bits =
                    ((sel + CARRY) >> 7) & SPREAD;
                memcpy(dst + stripe * 64 + byte * 8, &bits, 8);
            }
        }
    }
}

// inp: (n_frames, n_pix) u8; out: same, order reversed in groups of 8
void decode_r6(const uint8_t* inp, uint8_t* out,
               int64_t n_frames, int64_t n_pix) {
    for (int64_t f = 0; f < n_frames; f++) {
        const uint8_t* src = inp + f * n_pix;
        uint8_t* dst = out + f * n_pix;
        for (int64_t g = 0; g < n_pix / 8; g++) {
            for (int64_t c = 0; c < 8; c++) {
                dst[g * 8 + 7 - c] = src[g * 8 + c];
            }
        }
    }
}

// inp: (n_frames, n_pix) big-endian u16 bytes; out: native u16,
// order reversed in groups of 4
void decode_r12(const uint8_t* inp, uint16_t* out,
                int64_t n_frames, int64_t n_pix) {
    for (int64_t f = 0; f < n_frames; f++) {
        const uint8_t* src = inp + f * n_pix * 2;
        uint16_t* dst = out + f * n_pix;
        for (int64_t g = 0; g < n_pix / 4; g++) {
            for (int64_t c = 0; c < 4; c++) {
                const int64_t i = g * 4 + c;
                dst[g * 4 + 3 - c] =
                    (uint16_t)((src[i * 2] << 8) | src[i * 2 + 1]);
            }
        }
    }
}

// inp: (n_frames, 2, n_pix) big-endian u16 bytes (MSB sub-frame then
// LSB sub-frame); out: (n_frames, n_pix) u32
void decode_r24(const uint8_t* inp, uint32_t* out,
                int64_t n_frames, int64_t n_pix) {
    for (int64_t f = 0; f < n_frames; f++) {
        const uint8_t* msb = inp + f * n_pix * 4;
        const uint8_t* lsb = msb + n_pix * 2;
        uint32_t* dst = out + f * n_pix;
        for (int64_t g = 0; g < n_pix / 4; g++) {
            for (int64_t c = 0; c < 4; c++) {
                const int64_t i = g * 4 + c;
                const uint32_t hi =
                    (uint32_t)((msb[i * 2] << 8) | msb[i * 2 + 1]);
                const uint32_t lo =
                    (uint32_t)((lsb[i * 2] << 8) | lsb[i * 2 + 1]);
                dst[g * 4 + 3 - c] = (hi << 12) | lo;
            }
        }
    }
}

// big-endian -> native byteswap for u16/u32/u64 arrays
void byteswap16(const uint16_t* inp, uint16_t* out, int64_t n) {
    for (int64_t i = 0; i < n; i++) {
        const uint16_t v = inp[i];
        out[i] = (uint16_t)((v << 8) | (v >> 8));
    }
}

void byteswap32(const uint32_t* inp, uint32_t* out, int64_t n) {
    for (int64_t i = 0; i < n; i++) {
        const uint32_t v = inp[i];
        out[i] = ((v & 0x000000FFu) << 24) | ((v & 0x0000FF00u) << 8)
               | ((v & 0x00FF0000u) >> 8) | ((v & 0xFF000000u) >> 24);
    }
}

// 12-bit little-endian packed pairs (3 bytes -> 2 pixels), used by the
// K2 IS format (reference: k2is.py:83 decode_uint12_le)
void decode_uint12_le(const uint8_t* inp, uint16_t* out, int64_t n_pairs) {
    for (int64_t i = 0; i < n_pairs; i++) {
        const uint8_t b0 = inp[i * 3];
        const uint8_t b1 = inp[i * 3 + 1];
        const uint8_t b2 = inp[i * 3 + 2];
        out[i * 2] = (uint16_t)(b0 | ((b1 & 0x0F) << 8));
        out[i * 2 + 1] = (uint16_t)(((b1 & 0xF0) >> 4) | (b2 << 4));
    }
}

}  // extern "C"
