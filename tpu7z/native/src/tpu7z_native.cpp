// tpu7z native host runtime: hot serial loops that stay on the CPU side
// of the framework (the TPU data plane is JAX/Pallas; these are the host
// analogs of the reference's C kernels: C/Xxh64.c, C/7zCrc.c,
// C/LzmaDec.c, C/lz4/lz4.c decode loop).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the
// image). Build: make -C tpu7z/native

#include <cstdint>
#include <cstring>
#include <cstdlib>

extern "C" {

// ---------------------------------------------------------------------------
// XXH32 / XXH64 (public spec)
// ---------------------------------------------------------------------------

static inline uint32_t rotl32(uint32_t x, int r) { return (x << r) | (x >> (32 - r)); }
static inline uint64_t rotl64(uint64_t x, int r) { return (x << r) | (x >> (64 - r)); }

uint32_t tz_xxh32(const uint8_t* p, size_t len, uint32_t seed) {
    const uint32_t P1 = 2654435761U, P2 = 2246822519U, P3 = 3266489917U,
                   P4 = 668265263U, P5 = 374761393U;
    const uint8_t* end = p + len;
    uint32_t h;
    if (len >= 16) {
        uint32_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
        const uint8_t* lim = end - 16;
        do {
            uint32_t k;
            memcpy(&k, p, 4); v1 = rotl32(v1 + k * P2, 13) * P1; p += 4;
            memcpy(&k, p, 4); v2 = rotl32(v2 + k * P2, 13) * P1; p += 4;
            memcpy(&k, p, 4); v3 = rotl32(v3 + k * P2, 13) * P1; p += 4;
            memcpy(&k, p, 4); v4 = rotl32(v4 + k * P2, 13) * P1; p += 4;
        } while (p <= lim);
        h = rotl32(v1, 1) + rotl32(v2, 7) + rotl32(v3, 12) + rotl32(v4, 18);
    } else {
        h = seed + P5;
    }
    h += (uint32_t)len;
    while (p + 4 <= end) { uint32_t k; memcpy(&k, p, 4); h = rotl32(h + k * P3, 17) * P4; p += 4; }
    while (p < end) { h = rotl32(h + (*p++) * P5, 11) * P1; }
    h ^= h >> 15; h *= P2; h ^= h >> 13; h *= P3; h ^= h >> 16;
    return h;
}

uint64_t tz_xxh64(const uint8_t* p, size_t len, uint64_t seed) {
    const uint64_t P1 = 11400714785074694791ULL, P2 = 14029467366897019727ULL,
                   P3 = 1609587929392839161ULL, P4 = 9650029242287828579ULL,
                   P5 = 2870177450012600261ULL;
    const uint8_t* end = p + len;
    uint64_t h;
    if (len >= 32) {
        uint64_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
        const uint8_t* lim = end - 32;
        do {
            uint64_t k;
            memcpy(&k, p, 8); v1 = rotl64(v1 + k * P2, 31) * P1; p += 8;
            memcpy(&k, p, 8); v2 = rotl64(v2 + k * P2, 31) * P1; p += 8;
            memcpy(&k, p, 8); v3 = rotl64(v3 + k * P2, 31) * P1; p += 8;
            memcpy(&k, p, 8); v4 = rotl64(v4 + k * P2, 31) * P1; p += 8;
        } while (p <= lim);
        h = rotl64(v1, 1) + rotl64(v2, 7) + rotl64(v3, 12) + rotl64(v4, 18);
        v1 *= P2; v1 = rotl64(v1, 31); v1 *= P1; h ^= v1; h = h * P1 + P4;
        v2 *= P2; v2 = rotl64(v2, 31); v2 *= P1; h ^= v2; h = h * P1 + P4;
        v3 *= P2; v3 = rotl64(v3, 31); v3 *= P1; h ^= v3; h = h * P1 + P4;
        v4 *= P2; v4 = rotl64(v4, 31); v4 *= P1; h ^= v4; h = h * P1 + P4;
    } else {
        h = seed + P5;
    }
    h += (uint64_t)len;
    while (p + 8 <= end) {
        uint64_t k; memcpy(&k, p, 8);
        k *= P2; k = rotl64(k, 31); k *= P1;
        h ^= k; h = rotl64(h, 27) * P1 + P4; p += 8;
    }
    if (p + 4 <= end) {
        uint32_t k; memcpy(&k, p, 4);
        h ^= (uint64_t)k * P1; h = rotl64(h, 23) * P2 + P3; p += 4;
    }
    while (p < end) { h ^= (*p++) * P5; h = rotl64(h, 11) * P1; }
    h ^= h >> 33; h *= P2; h ^= h >> 29; h *= P3; h ^= h >> 32;
    return h;
}

// ---------------------------------------------------------------------------
// CRC32 (IEEE) / CRC64 (ECMA reflected) — slice-by-8
// ---------------------------------------------------------------------------

static uint32_t crc32_tab[8][256];
static uint64_t crc64_tab[4][256];
static int crc_init_done = 0;

static void crc_init() {
    if (crc_init_done) return;
    for (int i = 0; i < 256; i++) {
        uint32_t c = i;
        for (int k = 0; k < 8; k++) c = (c >> 1) ^ (0xEDB88320U & (0u - (c & 1)));
        crc32_tab[0][i] = c;
        uint64_t d = i;
        for (int k = 0; k < 8; k++) d = (d >> 1) ^ (0xC96C5795D7870F42ULL & (0ull - (d & 1)));
        crc64_tab[0][i] = d;
    }
    for (int t = 1; t < 8; t++)
        for (int i = 0; i < 256; i++)
            crc32_tab[t][i] = (crc32_tab[t-1][i] >> 8) ^ crc32_tab[0][crc32_tab[t-1][i] & 0xFF];
    for (int t = 1; t < 4; t++)
        for (int i = 0; i < 256; i++)
            crc64_tab[t][i] = (crc64_tab[t-1][i] >> 8) ^ crc64_tab[0][crc64_tab[t-1][i] & 0xFF];
    crc_init_done = 1;
}

uint32_t tz_crc32(const uint8_t* p, size_t len, uint32_t crc) {
    crc_init();
    uint32_t c = crc ^ 0xFFFFFFFFU;
    while (len >= 8) {
        uint32_t lo; memcpy(&lo, p, 4);
        lo ^= c;
        c = crc32_tab[7][lo & 0xFF] ^ crc32_tab[6][(lo >> 8) & 0xFF]
          ^ crc32_tab[5][(lo >> 16) & 0xFF] ^ crc32_tab[4][lo >> 24]
          ^ crc32_tab[3][p[4]] ^ crc32_tab[2][p[5]]
          ^ crc32_tab[1][p[6]] ^ crc32_tab[0][p[7]];
        p += 8; len -= 8;
    }
    while (len--) c = (c >> 8) ^ crc32_tab[0][(c ^ *p++) & 0xFF];
    return c ^ 0xFFFFFFFFU;
}

uint64_t tz_crc64(const uint8_t* p, size_t len, uint64_t crc) {
    crc_init();
    uint64_t c = crc ^ 0xFFFFFFFFFFFFFFFFULL;
    while (len >= 4) {
        c ^= (uint64_t)p[0] | ((uint64_t)p[1] << 8)
           | ((uint64_t)p[2] << 16) | ((uint64_t)p[3] << 24);
        c = crc64_tab[3][c & 0xFF] ^ crc64_tab[2][(c >> 8) & 0xFF]
          ^ crc64_tab[1][(c >> 16) & 0xFF] ^ crc64_tab[0][(c >> 24) & 0xFF]
          ^ (c >> 32);
        p += 4; len -= 4;
    }
    while (len--) c = (c >> 8) ^ crc64_tab[0][(c ^ *p++) & 0xFF];
    return c ^ 0xFFFFFFFFFFFFFFFFULL;
}

// ---------------------------------------------------------------------------
// LZ4 raw block decode (format per lz4_Block_format; own implementation)
// ---------------------------------------------------------------------------

long long tz_lz4_decode(const uint8_t* src, size_t srcn,
                        uint8_t* dst, size_t dstn) {
    size_t ip = 0, op = 0;
    while (ip < srcn) {
        unsigned token = src[ip++];
        size_t lit = token >> 4;
        if (lit == 15) {
            unsigned b;
            do { if (ip >= srcn) return -1; b = src[ip++]; lit += b; } while (b == 255);
        }
        if (ip + lit > srcn || op + lit > dstn) return -1;
        memcpy(dst + op, src + ip, lit);
        ip += lit; op += lit;
        if (ip == srcn) break;
        if (ip + 2 > srcn) return -1;
        size_t offset = src[ip] | ((size_t)src[ip+1] << 8);
        ip += 2;
        if (offset == 0 || offset > op) return -1;
        size_t ml = (token & 15);
        if (ml == 15) {
            unsigned b;
            do { if (ip >= srcn) return -1; b = src[ip++]; ml += b; } while (b == 255);
        }
        ml += 4;
        if (op + ml > dstn) return -1;
        const uint8_t* m = dst + op - offset;
        if (offset >= ml) { memcpy(dst + op, m, ml); op += ml; }
        else { for (size_t k = 0; k < ml; k++) dst[op + k] = m[k]; op += ml; }
    }
    return (long long)op;
}

// ---------------------------------------------------------------------------
// LZMA1 decoder (behavior per the public LZMA spec / C/LzmaDec.c model)
// ---------------------------------------------------------------------------

struct TzLzma {
    uint16_t* probs;
    size_t nprobs;
    int lc, lp, pb;
    unsigned state;
    uint32_t reps[4];
    uint64_t origin;  // dictionary origin (LZMA2 dict reset): position
                      // context and distance bounds restart here
};

enum {  // probability layout offsets (computed at init)
    kNumStates = 12,
};

static size_t lzma_nprobs(int lc, int lp) {
    // is_match 192 + is_rep 12 + g0 12 + g1 12 + g2 12 + rep0long 192
    // + pos_slot 256 + spec_pos 115 + align 16
    // + len (2 + 128 + 128 + 256) + replen (same) + literal 0x300<<(lc+lp)
    return 192 + 12*4 + 192 + 256 + 115 + 16 + 2*(2 + 128 + 128 + 256)
         + ((size_t)0x300 << (lc + lp));
}

// offsets
#define OFF_IS_MATCH    0
#define OFF_IS_REP      192
#define OFF_G0          204
#define OFF_G1          216
#define OFF_G2          228
#define OFF_REP0LONG    240
#define OFF_POS_SLOT    432
#define OFF_SPEC_POS    688
#define OFF_ALIGN       803
#define OFF_LEN         819
#define OFF_REPLEN      (819 + 514)
#define OFF_LITERAL     (819 + 2*514)

void* tz_lzma_new(int lc, int lp, int pb) {
    TzLzma* z = (TzLzma*)malloc(sizeof(TzLzma));
    z->lc = lc; z->lp = lp; z->pb = pb;
    z->nprobs = lzma_nprobs(lc, lp);
    z->probs = (uint16_t*)malloc(z->nprobs * sizeof(uint16_t));
    for (size_t i = 0; i < z->nprobs; i++) z->probs[i] = 1024;
    z->state = 0; z->reps[0] = z->reps[1] = z->reps[2] = z->reps[3] = 0;
    z->origin = 0;
    return z;
}

// LZMA2 dictionary reset: subsequent chunks behave as if output started
// at `origin` (C/Lzma2Dec.c dicPos handling)
void tz_lzma_set_origin(void* h, uint64_t origin) {
    ((TzLzma*)h)->origin = origin;
}

void tz_lzma_reset_state(void* h) {
    TzLzma* z = (TzLzma*)h;
    for (size_t i = 0; i < z->nprobs; i++) z->probs[i] = 1024;
    z->state = 0; z->reps[0] = z->reps[1] = z->reps[2] = z->reps[3] = 0;
}

void tz_lzma_reset_props(void* h, int lc, int lp, int pb) {
    TzLzma* z = (TzLzma*)h;
    size_t need = lzma_nprobs(lc, lp);
    if (need != z->nprobs) {
        free(z->probs);
        z->probs = (uint16_t*)malloc(need * sizeof(uint16_t));
        z->nprobs = need;
    }
    z->lc = lc; z->lp = lp; z->pb = pb;
    tz_lzma_reset_state(h);
}

void tz_lzma_free(void* h) {
    TzLzma* z = (TzLzma*)h;
    free(z->probs); free(z);
}

struct RD {
    const uint8_t* p; const uint8_t* end;
    uint32_t range, code; int overread;
};

static inline void rd_norm(RD* r) {
    if (r->range < (1u << 24)) {
        uint8_t b = 0;
        if (r->p < r->end) b = *r->p;
        else if (++r->overread > 24) { /* flagged */ }
        r->p++;
        r->range <<= 8;
        r->code = (r->code << 8) | b;
    }
}

static inline int rd_bit(RD* r, uint16_t* prob) {
    uint32_t bound = (r->range >> 11) * *prob;
    if (r->code < bound) {
        r->range = bound;
        *prob = (uint16_t)(*prob + ((2048 - *prob) >> 5));
        rd_norm(r);
        return 0;
    }
    r->range -= bound;
    r->code -= bound;
    *prob = (uint16_t)(*prob - (*prob >> 5));
    rd_norm(r);
    return 1;
}

static inline unsigned rd_tree(RD* r, uint16_t* probs, int nbits) {
    unsigned m = 1;
    for (int i = 0; i < nbits; i++) m = (m << 1) + rd_bit(r, probs + m);
    return m - (1u << nbits);
}

static inline unsigned rd_tree_rev(RD* r, uint16_t* probs, int nbits) {
    unsigned m = 1, sym = 0;
    for (int i = 0; i < nbits; i++) {
        unsigned b = rd_bit(r, probs + m);
        m = (m << 1) + b;
        sym |= b << i;
    }
    return sym;
}

static inline unsigned rd_direct(RD* r, int nbits) {
    unsigned res = 0;
    for (int i = 0; i < nbits; i++) {
        r->range >>= 1;
        r->code -= r->range;
        uint32_t t = 0u - (r->code >> 31);
        r->code += r->range & t;
        rd_norm(r);
        res = (res << 1) + (t + 1);
    }
    return res;
}

static inline unsigned rd_len(RD* r, uint16_t* lp, unsigned pos_state) {
    if (!rd_bit(r, lp + 0))
        return 2 + rd_tree(r, lp + 2 + (pos_state << 3), 3);
    if (!rd_bit(r, lp + 1))
        return 10 + rd_tree(r, lp + 130 + (pos_state << 3), 3);
    return 18 + rd_tree(r, lp + 258, 8);
}

// decode until `limit` bytes at window[pos..]; returns bytes consumed from
// src, or -1 on error, or -2 on end-marker.
long long tz_lzma_decode_chunk(void* h, const uint8_t* src, size_t srcn,
                               uint8_t* window, uint64_t pos,
                               uint64_t limit) {
    TzLzma* z = (TzLzma*)h;
    if (srcn < 5 || src[0] != 0) return -1;
    RD r; r.p = src + 1; r.end = src + srcn; r.overread = 0;
    r.range = 0xFFFFFFFFu;
    r.code = ((uint32_t)r.p[0] << 24) | ((uint32_t)r.p[1] << 16)
           | ((uint32_t)r.p[2] << 8) | r.p[3];
    r.p += 4;

    uint16_t* P = z->probs;
    unsigned state = z->state;
    uint32_t rep0 = z->reps[0], rep1 = z->reps[1], rep2 = z->reps[2], rep3 = z->reps[3];
    unsigned pb_mask = (1u << z->pb) - 1;
    unsigned lp_mask = (1u << z->lp) - 1;
    int lc = z->lc;
    uint64_t end = pos + limit;
    const uint64_t origin = z->origin;

    while (pos < end) {
        if (r.overread > 20) return -1;
        unsigned pos_state = (unsigned)(pos - origin) & pb_mask;
        if (!rd_bit(&r, P + OFF_IS_MATCH + (state << 4) + pos_state)) {
            unsigned prev = pos > origin ? window[pos - 1] : 0;
            unsigned lit_state = (((unsigned)(pos - origin) & lp_mask) << lc) + (prev >> (8 - lc));
            uint16_t* lit = P + OFF_LITERAL + 0x300 * (size_t)lit_state;
            unsigned sym = 1;
            if (state < 7) {
                while (sym < 0x100) sym = (sym << 1) | rd_bit(&r, lit + sym);
            } else {
                unsigned match_byte = window[pos - rep0 - 1];
                do {
                    unsigned match_bit = (match_byte >> 7) & 1;
                    match_byte <<= 1;
                    unsigned b = rd_bit(&r, lit + ((1 + match_bit) << 8) + sym);
                    sym = (sym << 1) | b;
                    if (match_bit != b) {
                        while (sym < 0x100) sym = (sym << 1) | rd_bit(&r, lit + sym);
                        break;
                    }
                } while (sym < 0x100);
            }
            window[pos++] = (uint8_t)sym;
            state = state < 4 ? 0 : (state < 10 ? state - 3 : state - 6);
            continue;
        }
        unsigned length;
        if (!rd_bit(&r, P + OFF_IS_REP + state)) {
            rep3 = rep2; rep2 = rep1; rep1 = rep0;
            length = rd_len(&r, P + OFF_LEN, pos_state);
            state = state < 7 ? 7 : 10;
            unsigned len_state = length - 2 < 3 ? length - 2 : 3;
            unsigned slot = rd_tree(&r, P + OFF_POS_SLOT + (len_state << 6), 6);
            if (slot < 4) rep0 = slot;
            else {
                int nd = (int)(slot >> 1) - 1;
                rep0 = (2 | (slot & 1)) << nd;
                if (slot < 14)
                    rep0 += rd_tree_rev(&r, P + OFF_SPEC_POS + rep0 - slot - 1, nd);
                else {
                    rep0 += rd_direct(&r, nd - 4) << 4;
                    rep0 += rd_tree_rev(&r, P + OFF_ALIGN, 4);
                    if (rep0 == 0xFFFFFFFFu) {
                        z->state = state; z->reps[0] = z->reps[1] = z->reps[2] = z->reps[3] = 0;
                        return -2;  // end marker
                    }
                }
            }
        } else {
            if (!rd_bit(&r, P + OFF_G0 + state)) {
                if (!rd_bit(&r, P + OFF_REP0LONG + (state << 4) + pos_state)) {
                    state = state < 7 ? 9 : 11;
                    if (rep0 + 1 > pos - origin) return -1;
                    window[pos] = window[pos - rep0 - 1];
                    pos++;
                    continue;
                }
            } else {
                uint32_t dist;
                if (!rd_bit(&r, P + OFF_G1 + state)) dist = rep1;
                else {
                    if (!rd_bit(&r, P + OFF_G2 + state)) dist = rep2;
                    else { dist = rep3; rep3 = rep2; }
                    rep2 = rep1;
                }
                rep1 = rep0; rep0 = dist;
            }
            length = rd_len(&r, P + OFF_REPLEN, pos_state);
            state = state < 7 ? 8 : 11;
        }
        if (rep0 + 1 > pos - origin || pos + length > end) return -1;
        const uint8_t* m = window + pos - rep0 - 1;
        uint8_t* d = window + pos;
        for (unsigned k = 0; k < length; k++) d[k] = m[k];
        pos += length;
    }
    z->state = state;
    z->reps[0] = rep0; z->reps[1] = rep1; z->reps[2] = rep2; z->reps[3] = rep3;
    return (long long)(r.p - src);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// LZ4 raw block encode (greedy hash-table parse; own implementation of
// the public block format)
// ---------------------------------------------------------------------------

// Encode src[start, n) as an LZ4 block; matches may reach back into
// src[0, start) (the linked-blocks window, lz4frame.c LZ4F_blockLinked
// semantics). start=0 gives the plain independent-block encoder.
extern "C" long long tz_lz4_encode_region(const uint8_t* src, size_t n,
                                          size_t start,
                                          uint8_t* dst, size_t cap) {
    if (n <= start) { if (cap < 1) return -1; dst[0] = 0; return 1; }
    const size_t HASH_LOG = 16, HSIZE = 1u << HASH_LOG;
    static thread_local uint32_t* table = nullptr;
    if (!table) table = (uint32_t*)malloc(HSIZE * sizeof(uint32_t));
    for (size_t i = 0; i < HSIZE; i++) table[i] = 0xFFFFFFFFu;

    size_t ip = start, op = 0, anchor = start;
    const size_t mflimit = n >= 12 ? n - 12 : 0;
    const size_t matchlimit = n >= 5 ? n - 5 : 0;

    // 5-byte multiplicative hash (64-bit loads): fewer collisions than a
    // 4-byte hash at the same table size, which is where most of the
    // greedy tier's ratio comes from
    auto hash4 = [&](size_t p) {
        uint64_t v; memcpy(&v, src + p, 8);
        return (uint32_t)(((v & 0xFFFFFFFFFFull) * 0x9E3779B185EBCA87ull)
                          >> (64 - HASH_LOG));
    };
    // 8-bytes-at-a-time forward match length
    auto fwd_count = [&](size_t a, size_t b) {
        size_t len = 0;
        while (a + len + 8 <= matchlimit) {
            uint64_t x, y;
            memcpy(&x, src + a + len, 8);
            memcpy(&y, src + b + len, 8);
            uint64_t d = x ^ y;
            if (d) return len + (__builtin_ctzll(d) >> 3);
            len += 8;
        }
        while (a + len < matchlimit && src[a + len] == src[b + len]) len++;
        return len;
    };
    auto emit = [&](size_t lit_start, size_t lit_len, size_t offset,
                    size_t mlen) -> bool {
        size_t need = 1 + lit_len / 255 + 1 + lit_len + 2 + mlen / 255 + 1;
        if (op + need + 8 > cap) return false;
        uint8_t* tok = dst + op++;
        size_t l = lit_len;
        *tok = (uint8_t)((l >= 15 ? 15 : l) << 4);
        if (l >= 15) { l -= 15; while (l >= 255) { dst[op++] = 255; l -= 255; } dst[op++] = (uint8_t)l; }
        memcpy(dst + op, src + lit_start, lit_len); op += lit_len;
        if (mlen) {
            dst[op++] = (uint8_t)offset; dst[op++] = (uint8_t)(offset >> 8);
            size_t m = mlen - 4;
            *tok |= (uint8_t)(m >= 15 ? 15 : m);
            if (m >= 15) { m -= 15; while (m >= 255) { dst[op++] = 255; m -= 255; } dst[op++] = (uint8_t)m; }
        }
        return true;
    };

    // seed the table with the linked-mode window (nearest occurrence
    // wins, so scan forward)
    if (start) {
        size_t wfrom = start > 0xFFFF ? start - 0xFFFF : 0;
        size_t wlim = start < mflimit ? start : mflimit;
        for (size_t p = wfrom; p < wlim; p++)
            table[hash4(p)] = (uint32_t)p;
    }
    // miss-streak acceleration: each run of misses widens the scan step,
    // so incompressible stretches cost ~1 probe per 64 bytes instead of
    // one per byte (the reference's skipStrength idea, C/lz4/lz4.c
    // LZ4_compress_generic, re-derived)
    const unsigned kSkipStrength = 6;
    unsigned miss_nb = 1u << kSkipStrength;
    while (ip < mflimit) {
        uint32_t h = hash4(ip);
        uint32_t cand = table[h];
        table[h] = (uint32_t)ip;
        uint32_t v0, v1;
        if (cand != 0xFFFFFFFFu && ip - cand <= 0xFFFF) {
            memcpy(&v0, src + cand, 4);
            memcpy(&v1, src + ip, 4);
            if (v0 == v1) {
                miss_nb = 1u << kSkipStrength;
                // extend the match backward over pending literals
                size_t mp = cand;
                while (ip > anchor && mp > 0 &&
                       src[ip - 1] == src[mp - 1]) { ip--; mp--; }
                size_t mlen = 4 + fwd_count(ip + 4, mp + 4);
                if (!emit(anchor, ip - anchor, ip - mp, mlen)) return -1;
                size_t e = ip + mlen;
                // index two interior positions (reference re-indexes
                // end-2; a mid point helps long matches link forward)
                if (e >= 3 && e - 2 < mflimit)
                    table[hash4(e - 2)] = (uint32_t)(e - 2);
                size_t mid = ip + mlen / 2;
                if (mid < mflimit) table[hash4(mid)] = (uint32_t)mid;
                ip = e; anchor = e;
                continue;
            }
        }
        ip += miss_nb++ >> kSkipStrength;
    }
    // trailing literals
    {
        size_t lit = n - anchor;
        size_t need = 1 + lit / 255 + 1 + lit;
        if (op + need > cap) return -1;
        uint8_t* tok = dst + op++;
        size_t l = lit;
        *tok = (uint8_t)((l >= 15 ? 15 : l) << 4);
        if (l >= 15) { l -= 15; while (l >= 255) { dst[op++] = 255; l -= 255; } dst[op++] = (uint8_t)l; }
        memcpy(dst + op, src + anchor, lit); op += lit;
    }
    return (long long)op;
}

extern "C" long long tz_lz4_encode(const uint8_t* src, size_t n,
                                   uint8_t* dst, size_t cap) {
    return tz_lz4_encode_region(src, n, 0, dst, cap);
}
