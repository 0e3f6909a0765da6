// Fast WAV ingest for the archive/streaming data path.
//
// The decode engines consume conditioned float PCM; for 1000-drop archive
// jobs the Python/scipy reader becomes the host-side bottleneck (it parses
// chunks in Python and round-trips through an int array).  This library
// does a single-pass parse + condition in C++ and releases the GIL via
// ctypes, so the archive runner's prefetch threads overlap device decode
// with real parallel file IO.
//
// Scope: RIFF/WAVE with PCM16 / PCM32 / IEEE float32 samples, channel 0 of
// up to 8 channels.  Conditioning matches the engines' contract
// (reference AXCTDprocessor.py:54-57): subtract the mean, divide by the
// peak magnitude — computed on the raw integer samples.
//
// Build: g++ -O3 -shared -fPIC wavio.cpp -o libaxctd_wavio.so
// (done on demand by axctdprocessor_tpu.utils.native)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>

namespace {

struct WavInfo {
    int32_t fs = 0;
    int32_t n_channels = 0;
    int32_t bits = 0;
    int32_t format = 0;   // 1 = PCM int, 3 = IEEE float
    int64_t n_frames = 0;
    int64_t data_offset = 0;
    int64_t data_bytes = 0;
};

bool parse_header(FILE* f, WavInfo* info) {
    char tag[4];
    uint32_t sz;
    if (fread(tag, 1, 4, f) != 4 || memcmp(tag, "RIFF", 4)) return false;
    if (fread(&sz, 4, 1, f) != 1) return false;
    if (fread(tag, 1, 4, f) != 4 || memcmp(tag, "WAVE", 4)) return false;

    bool have_fmt = false;
    while (fread(tag, 1, 4, f) == 4 && fread(&sz, 4, 1, f) == 1) {
        if (!memcmp(tag, "fmt ", 4)) {
            uint16_t fmt16, nch16, bits16;
            uint32_t fs32, brate;
            uint16_t balign;
            if (sz < 16) return false;
            fread(&fmt16, 2, 1, f);
            fread(&nch16, 2, 1, f);
            fread(&fs32, 4, 1, f);
            fread(&brate, 4, 1, f);
            fread(&balign, 2, 1, f);
            fread(&bits16, 2, 1, f);
            if (sz > 16) fseek(f, sz - 16, SEEK_CUR);
            info->format = fmt16;
            info->n_channels = nch16;
            info->fs = (int32_t)fs32;
            info->bits = bits16;
            have_fmt = true;
        } else if (!memcmp(tag, "data", 4)) {
            info->data_offset = ftell(f);
            info->data_bytes = sz;
            fseek(f, (sz + 1) & ~1u, SEEK_CUR);  // chunks are word-aligned
        } else {
            fseek(f, (sz + 1) & ~1u, SEEK_CUR);
        }
    }
    if (!have_fmt || !info->data_offset) return false;
    int64_t frame_bytes = (int64_t)info->n_channels * (info->bits / 8);
    if (frame_bytes <= 0) return false;
    info->n_frames = info->data_bytes / frame_bytes;
    return true;
}

}  // namespace

extern "C" {

// Returns 0 on success; fills fs, n_frames, n_channels, bits.
int axctd_wav_info(const char* path, int32_t* fs, int64_t* n_frames,
                   int32_t* n_channels, int32_t* bits) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    WavInfo info;
    bool ok = parse_header(f, &info);
    fclose(f);
    if (!ok) return -2;
    *fs = info.fs;
    *n_frames = info.n_frames;
    *n_channels = info.n_channels;
    *bits = info.bits;
    return 0;
}

// Reads channel 0, conditioned ((x - mean) / max|x|), into out[n_frames]
// (float32).  Returns 0 on success.
int axctd_wav_read_conditioned(const char* path, float* out,
                               int64_t n_frames_expected) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    WavInfo info;
    if (!parse_header(f, &info) || info.n_frames != n_frames_expected) {
        fclose(f);
        return -2;
    }
    fseek(f, info.data_offset, SEEK_SET);

    const int64_t n = info.n_frames;
    const int nch = info.n_channels;
    std::vector<double> ch0(n);

    if (info.format == 1 && info.bits == 16) {
        std::vector<int16_t> buf(n * nch);
        if ((int64_t)fread(buf.data(), 2, n * nch, f) != n * nch) {
            fclose(f);
            return -3;
        }
        for (int64_t i = 0; i < n; ++i) ch0[i] = (double)buf[i * nch];
    } else if (info.format == 1 && info.bits == 32) {
        std::vector<int32_t> buf(n * nch);
        if ((int64_t)fread(buf.data(), 4, n * nch, f) != n * nch) {
            fclose(f);
            return -3;
        }
        for (int64_t i = 0; i < n; ++i) ch0[i] = (double)buf[i * nch];
    } else if (info.format == 3 && info.bits == 32) {
        std::vector<float> buf(n * nch);
        if ((int64_t)fread(buf.data(), 4, n * nch, f) != n * nch) {
            fclose(f);
            return -3;
        }
        for (int64_t i = 0; i < n; ++i) ch0[i] = (double)buf[i * nch];
    } else {
        fclose(f);
        return -4;  // unsupported encoding
    }
    fclose(f);

    double mean = 0.0;
    for (int64_t i = 0; i < n; ++i) mean += ch0[i];
    mean /= (double)n;
    double peak = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        double a = std::fabs(ch0[i]);
        if (a > peak) peak = a;
    }
    if (peak == 0.0) peak = 1.0;
    for (int64_t i = 0; i < n; ++i) {
        out[i] = (float)((ch0[i] - mean) / peak);
    }
    return 0;
}

// Wire-format quantizers (ops.wire): the int8/int4 host->device upload
// encodings.  numpy needs 3-4 full float passes (~210/460 ms for a
// 600 s drop on this container's single core — 16-35% of the decode
// wall); these do one peak pass + one fused scale/round/store pass.
//
// Rounding must bit-match np.rint (round half to even).  lrintf is NOT
// used: gcc -O3's auto-vectorized form truncates (observed: the scalar
// epilogue rounded -103.5007 -> -104 while the vector body gave -103).
// The magic-constant form below ((v + 1.5*2^23) - 1.5*2^23) is exact
// nearest-even for |v| <= ~2^22, vectorizes as plain float adds, and is
// immune to that bug.

static inline float round_ne(float v) {
    const float C = 12582912.0f;  // 1.5 * 2^23
    return (v + C) - C;
}

// out[n] = rint(x * 127/max|x|), int8.
void axctd_quantize_int8(const int16_t* x, int64_t n, int8_t* out) {
    int32_t peak = 1;
    for (int64_t i = 0; i < n; ++i) {
        int32_t a = x[i] < 0 ? -(int32_t)x[i] : (int32_t)x[i];
        if (a > peak) peak = a;
    }
    const float scale = (float)(127.0 / (double)peak);
    for (int64_t i = 0; i < n; ++i) {
        out[i] = (int8_t)(int32_t)round_ne((float)x[i] * scale);
    }
}

// Packed nibbles: sample k in byte k/2 (even sample = high nibble) as
// clip(rint(x * 7/max|x|), -7, 7) + 8; odd tail padded with the zero
// level (8).  out has (n+1)/2 bytes.
void axctd_quantize_int4(const int16_t* x, int64_t n, uint8_t* out) {
    int32_t peak = 1;
    for (int64_t i = 0; i < n; ++i) {
        int32_t a = x[i] < 0 ? -(int32_t)x[i] : (int32_t)x[i];
        if (a > peak) peak = a;
    }
    const float scale = (float)(7.0 / (double)peak);
    const int64_t pairs = n / 2;
    for (int64_t i = 0; i < pairs; ++i) {
        long hi = (long)round_ne((float)x[2 * i] * scale);
        long lo = (long)round_ne((float)x[2 * i + 1] * scale);
        hi = hi < -7 ? -7 : (hi > 7 ? 7 : hi);
        lo = lo < -7 ? -7 : (lo > 7 ? 7 : lo);
        out[i] = (uint8_t)(((hi + 8) << 4) | (lo + 8));
    }
    if (n & 1) {
        long hi = (long)round_ne((float)x[n - 1] * scale);
        hi = hi < -7 ? -7 : (hi > 7 ? 7 : hi);
        out[pairs] = (uint8_t)(((hi + 8) << 4) | 8);
    }
}

// Noise-shaped packed int4 (same wire format as axctd_quantize_int4 —
// the device unpack is identical; shaping is purely a host-side
// encoding choice).  First-order error feedback q[i] = Q(v), v = x[i] *
// scale + e, e' = v - q pushes the quantization noise spectrum to
// |1 - z^-1|^2 = 4 sin^2(pi f / fs): ~21 dB less noise at the 400/800 Hz
// FSK mark/space tones and ~14 dB less across the <=1300 Hz demod band
// (44.1 kHz rate), at the cost of ~3 dB more near Nyquist where the
// decode reads nothing.  The feedback clamp (|e| <= 1) keeps the loop
// stable through the clipped peaks.  Sequential by construction (the
// feedback is a loop-carried dependency), ~2x the plain quantizer's
// host cost — still far below the upload bytes it protects.
// Core shared by the two exported forms below.  q_sum/q_maxmag receive
// the sum and max magnitude of the emitted levels — the (dc, peak)
// statistics the segmented decoder's device conditioning needs, for
// free in the same pass (a separate stats pass costs ~60-100 ms even
// through LUTs; see ops.wire.int4_stats).
static void q4ns_core(const int16_t* x, int64_t n, uint8_t* out,
                      int64_t* q_sum, int32_t* q_maxmag) {
    int32_t peak = 1;
    for (int64_t i = 0; i < n; ++i) {
        int32_t a = x[i] < 0 ? -(int32_t)x[i] : (int32_t)x[i];
        if (a > peak) peak = a;
    }
    const float scale = (float)(7.0 / (double)peak);
    float e = 0.0f;
    int64_t sum = 0;
    int32_t mm = 0;
    const int64_t pairs = n / 2;
    for (int64_t i = 0; i < pairs; ++i) {
        float v0 = (float)x[2 * i] * scale + e;
        float q0 = round_ne(v0);
        q0 = q0 < -7.f ? -7.f : (q0 > 7.f ? 7.f : q0);
        e = v0 - q0;
        e = e < -1.f ? -1.f : (e > 1.f ? 1.f : e);
        float v1 = (float)x[2 * i + 1] * scale + e;
        float q1 = round_ne(v1);
        q1 = q1 < -7.f ? -7.f : (q1 > 7.f ? 7.f : q1);
        e = v1 - q1;
        e = e < -1.f ? -1.f : (e > 1.f ? 1.f : e);
        int i0 = (int)q0, i1 = (int)q1;
        sum += i0 + i1;
        int a0 = i0 < 0 ? -i0 : i0, a1 = i1 < 0 ? -i1 : i1;
        if (a0 > mm) mm = a0;
        if (a1 > mm) mm = a1;
        out[i] = (uint8_t)(((i0 + 8) << 4) | (i1 + 8));
    }
    if (n & 1) {
        float v0 = (float)x[n - 1] * scale + e;
        float q0 = round_ne(v0);
        q0 = q0 < -7.f ? -7.f : (q0 > 7.f ? 7.f : q0);
        int i0 = (int)q0;
        sum += i0;
        int a0 = i0 < 0 ? -i0 : i0;
        if (a0 > mm) mm = a0;
        out[pairs] = (uint8_t)(((i0 + 8) << 4) | 8);
    }
    *q_sum = sum;
    *q_maxmag = mm;
}

void axctd_quantize_int4_ns(const int16_t* x, int64_t n, uint8_t* out) {
    int64_t s;
    int32_t m;
    q4ns_core(x, n, out, &s, &m);
}

// Fused quantize + stats: q_sum/q_maxmag give dc = q_sum/n and
// peak = max(q_maxmag, 1) without re-reading the packed bytes.
void axctd_quantize_int4_ns_stats(const int16_t* x, int64_t n,
                                  uint8_t* out, int64_t* q_sum,
                                  int32_t* q_maxmag) {
    q4ns_core(x, n, out, q_sum, q_maxmag);
}

// One fast vectorizable pass: sum and |.|-peak of raw int16 samples.
// Feeds the chunked encoder's closed-form conditioning stats (the NS
// loop's noise transfer function has a zero at DC, so the emitted-level
// mean equals sum * scale / n up to the final carried error / n — below
// 1e-7 of a quantization step at waveform sizes).
void axctd_sum_peak_int16(const int16_t* x, int64_t n, int64_t* sum,
                          int32_t* peak) {
    int64_t s = 0;
    int32_t p = 1;
    for (int64_t i = 0; i < n; ++i) {
        s += x[i];
        int32_t a = x[i] < 0 ? -(int32_t)x[i] : (int32_t)x[i];
        if (a > p) p = a;
    }
    *sum = s;
    *peak = p;
}

// Carried-state chunked form of the noise-shaped int4 encoder: encodes
// x[0:nchunk) into out (nchunk/2 bytes; nchunk must be even except for
// the caller's final chunk), with the feedback error threading through
// *e_io across calls.  Byte-identical to one whole-waveform
// axctd_quantize_int4_ns call over the concatenated chunks when given
// scale = 7 / peak(whole waveform).  Lets the segmented decoder start
// the first host->device segment upload after ~6 ms of encoding instead
// of ~140 ms (the wire drain is IO — it overlaps the remaining chunks
// even on this 1-core host).
void axctd_quantize_int4_ns_chunk(const int16_t* x, int64_t nchunk,
                                  uint8_t* out, float scale, float* e_io) {
    float e = *e_io;
    const int64_t pairs = nchunk / 2;
    for (int64_t i = 0; i < pairs; ++i) {
        float v0 = (float)x[2 * i] * scale + e;
        float q0 = round_ne(v0);
        q0 = q0 < -7.f ? -7.f : (q0 > 7.f ? 7.f : q0);
        e = v0 - q0;
        e = e < -1.f ? -1.f : (e > 1.f ? 1.f : e);
        float v1 = (float)x[2 * i + 1] * scale + e;
        float q1 = round_ne(v1);
        q1 = q1 < -7.f ? -7.f : (q1 > 7.f ? 7.f : q1);
        e = v1 - q1;
        e = e < -1.f ? -1.f : (e > 1.f ? 1.f : e);
        out[i] = (uint8_t)((((int)q0 + 8) << 4) | ((int)q1 + 8));
    }
    if (nchunk & 1) {
        float v0 = (float)x[nchunk - 1] * scale + e;
        float q0 = round_ne(v0);
        q0 = q0 < -7.f ? -7.f : (q0 > 7.f ? 7.f : q0);
        e = v0 - q0;
        e = e < -1.f ? -1.f : (e > 1.f ? 1.f : e);
        out[pairs] = (uint8_t)((((int)q0 + 8) << 4) | 8);
    }
    *e_io = e;
}

}  // extern "C"
