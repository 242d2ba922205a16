// zig_lz4_tpu native host runtime -- C++ implementation of the
// canonical LZ4 block codec, xxHash32, and the sequence parser that
// feeds the TPU decode path.
//
// This is a from-scratch implementation of the same canonical
// algorithm as zig_lz4_tpu/ops/block.py (the Python oracle); outputs
// are byte-identical and tests enforce that.  It plays the role the
// reference implementation's compiled Zig plays on the host: wire
// format serialization at memory bandwidth, so the TPU pipeline is
// never bottlenecked on Python.
//
// Reference analogs (behavior, not code):
//   compress_fast     -- reference: src/lz4.zig:292-447
//   decompress        -- reference: src/lz4.zig:89-251
//   xxh32             -- Zig std.hash.XxHash32 (frame checksums)
//
// Exported with a plain C ABI for ctypes.

#include <cstdint>
#include <cstring>
#include <cstddef>

extern "C" {

// ---------------------------------------------------------------------
// xxHash32
// ---------------------------------------------------------------------

static inline uint32_t rotl32(uint32_t x, int r) {
    return (x << r) | (x >> (32 - r));
}

static const uint32_t P1 = 2654435761u, P2 = 2246822519u, P3 = 3266489917u,
                      P4 = 668265263u, P5 = 374761393u;

static inline uint32_t read32le(const uint8_t* p) {
    uint32_t v;
    std::memcpy(&v, p, 4);
    return v;  // little-endian hosts only (x86/ARM/TPU hosts)
}

static inline uint16_t read16le(const uint8_t* p) {
    uint16_t v;
    std::memcpy(&v, p, 2);
    return v;
}

uint32_t lz4tpu_xxh32(const uint8_t* data, size_t len, uint32_t seed) {
    const uint8_t* p = data;
    const uint8_t* end = data + len;
    uint32_t h;
    if (len >= 16) {
        uint32_t a1 = seed + P1 + P2, a2 = seed + P2, a3 = seed,
                 a4 = seed - P1;
        const uint8_t* limit = end - 16;
        do {
            a1 = rotl32(a1 + read32le(p) * P2, 13) * P1; p += 4;
            a2 = rotl32(a2 + read32le(p) * P2, 13) * P1; p += 4;
            a3 = rotl32(a3 + read32le(p) * P2, 13) * P1; p += 4;
            a4 = rotl32(a4 + read32le(p) * P2, 13) * P1; p += 4;
        } while (p <= limit);
        h = rotl32(a1, 1) + rotl32(a2, 7) + rotl32(a3, 12) + rotl32(a4, 18);
    } else {
        h = seed + P5;
    }
    h += (uint32_t)len;
    while (p + 4 <= end) {
        h = rotl32(h + read32le(p) * P3, 17) * P4;
        p += 4;
    }
    while (p < end) {
        h = rotl32(h + (*p) * P5, 11) * P1;
        ++p;
    }
    h ^= h >> 15; h *= P2;
    h ^= h >> 13; h *= P3;
    h ^= h >> 16;
    return h;
}

// streaming xxh32 state (for frame content checksums over big corpora)
struct XXH32State {
    uint32_t a1, a2, a3, a4;
    uint64_t total;
    uint32_t seed;
    uint8_t buf[16];
    uint32_t buflen;
};

void lz4tpu_xxh32_init(XXH32State* st, uint32_t seed) {
    st->a1 = seed + P1 + P2; st->a2 = seed + P2;
    st->a3 = seed; st->a4 = seed - P1;
    st->total = 0; st->seed = seed; st->buflen = 0;
}

void lz4tpu_xxh32_update(XXH32State* st, const uint8_t* data, size_t len) {
    st->total += len;
    if (st->buflen) {
        while (st->buflen < 16 && len) {
            st->buf[st->buflen++] = *data++;
            --len;
        }
        if (st->buflen == 16) {
            const uint8_t* p = st->buf;
            st->a1 = rotl32(st->a1 + read32le(p) * P2, 13) * P1;
            st->a2 = rotl32(st->a2 + read32le(p + 4) * P2, 13) * P1;
            st->a3 = rotl32(st->a3 + read32le(p + 8) * P2, 13) * P1;
            st->a4 = rotl32(st->a4 + read32le(p + 12) * P2, 13) * P1;
            st->buflen = 0;
        }
    }
    while (len >= 16) {
        st->a1 = rotl32(st->a1 + read32le(data) * P2, 13) * P1;
        st->a2 = rotl32(st->a2 + read32le(data + 4) * P2, 13) * P1;
        st->a3 = rotl32(st->a3 + read32le(data + 8) * P2, 13) * P1;
        st->a4 = rotl32(st->a4 + read32le(data + 12) * P2, 13) * P1;
        data += 16; len -= 16;
    }
    while (len--) st->buf[st->buflen++] = *data++;
}

uint32_t lz4tpu_xxh32_digest(const XXH32State* st) {
    uint32_t h;
    if (st->total >= 16) {
        h = rotl32(st->a1, 1) + rotl32(st->a2, 7) + rotl32(st->a3, 12)
            + rotl32(st->a4, 18);
    } else {
        h = st->seed + P5;
    }
    h += (uint32_t)st->total;
    const uint8_t* p = st->buf;
    const uint8_t* end = st->buf + st->buflen;
    while (p + 4 <= end) {
        h = rotl32(h + read32le(p) * P3, 17) * P4;
        p += 4;
    }
    while (p < end) {
        h = rotl32(h + (*p) * P5, 11) * P1;
        ++p;
    }
    h ^= h >> 15; h *= P2;
    h ^= h >> 13; h *= P3;
    h ^= h >> 16;
    return h;
}

size_t lz4tpu_xxh32_state_size() { return sizeof(XXH32State); }

// ---------------------------------------------------------------------
// Canonical fast block compressor (bit-identical to the Python oracle)
// ---------------------------------------------------------------------

static const int HASHLOG = 12;
static const int MINMATCH = 4;
static const int MFLIMIT = 12;
static const int LASTLITERALS = 5;
static const int SKIP_TRIGGER = 6;

static inline uint32_t hash4(uint32_t seq) {
    return (seq * 2654435761u) >> (32 - HASHLOG);
}

// error codes (match zig_lz4_tpu/errors.py BLOCK_ERROR_CODES)
#define ERR_OUTPUT_TOO_SMALL (-1)
#define ERR_INPUT_TOO_LARGE (-2)
#define ERR_CORRUPT (-3)

static int64_t emit_final_literals(const uint8_t* src, size_t anchor,
                                   size_t n, uint8_t* dst, size_t cap,
                                   size_t op) {
    size_t lit = n - anchor;
    size_t need = 1 + (lit >= 15 ? 1 + (lit - 15) / 255 : 0) + lit;
    if (op + need > cap) return ERR_OUTPUT_TOO_SMALL;
    if (lit >= 15) {
        dst[op++] = 15 << 4;
        size_t v = lit - 15;
        while (v >= 255) { dst[op++] = 255; v -= 255; }
        dst[op++] = (uint8_t)v;
    } else {
        dst[op++] = (uint8_t)(lit << 4);
    }
    std::memcpy(dst + op, src + anchor, lit);
    return (int64_t)(op + lit);
}

// Core loop over window[start..]; table stores (base + pos + 1).
// Mirrors ops/block.py::_compress_sequences exactly.
static int64_t compress_window(const uint8_t* w, size_t n, size_t start,
                               int accel, uint8_t* dst, size_t cap,
                               int64_t* table, int64_t base,
                               int64_t window_floor) {
    if (accel < 1) accel = 1;
    if (accel > 65537) accel = 65537;
    size_t anchor = start;
    size_t ip = (start == 0) ? 1 : start;
    size_t op = 0;
    if (n - start == 0) return 0;
    if (n < MFLIMIT + (size_t)1 + start || n - MFLIMIT <= ip ||
        n - start < MFLIMIT + 1) {
        return emit_final_literals(w, anchor, n, dst, cap, op);
    }
    size_t mflimit = n - MFLIMIT;
    size_t match_limit = n - LASTLITERALS;

    for (;;) {
        // --- search ---
        size_t step = 1;
        size_t search_match_nb = (size_t)accel << SKIP_TRIGGER;
        int64_t cand;
        uint32_t seq;
        for (;;) {
            if (ip >= mflimit)
                return emit_final_literals(w, anchor, n, dst, cap, op);
            seq = read32le(w + ip);
            uint32_t h = hash4(seq);
            int64_t entry = table[h];
            table[h] = base + (int64_t)ip + 1;
            if (entry) {
                cand = entry - 1 - base;
                if (cand >= window_floor &&
                    cand + 65535 >= (int64_t)ip &&
                    cand < (int64_t)ip &&
                    read32le(w + cand) == seq)
                    break;
            }
            ip += step;
            step = search_match_nb >> SKIP_TRIGGER;
            search_match_nb += 1;
        }

        // --- backward extension ---
        while (ip > anchor && cand > window_floor && w[ip - 1] == w[cand - 1]) {
            --ip; --cand;
        }

        // --- match length ---
        size_t mlen = MINMATCH;
        {
            size_t a = ip + MINMATCH, b = (size_t)cand + MINMATCH;
            while (a + 8 <= match_limit) {
                uint64_t x, y;
                std::memcpy(&x, w + a, 8);
                std::memcpy(&y, w + b, 8);
                uint64_t diff = x ^ y;
                if (diff) {
                    mlen += (size_t)(__builtin_ctzll(diff) >> 3);
                    goto have_len;
                }
                a += 8; b += 8; mlen += 8;
            }
            while (a < match_limit && w[a] == w[b]) { ++a; ++b; ++mlen; }
        }
    have_len:;

        // --- emit sequence ---
        {
            size_t lit = ip - anchor;
            size_t ml_token = mlen - MINMATCH;
            size_t need = 1 + (lit >= 15 ? 1 + (lit - 15) / 255 : 0) + lit
                          + 2 + (ml_token >= 15 ? 1 + (ml_token - 15) / 255 : 0);
            if (op + need > cap) return ERR_OUTPUT_TOO_SMALL;
            size_t token_pos = op++;
            if (lit >= 15) {
                dst[token_pos] = 15 << 4;
                size_t v = lit - 15;
                while (v >= 255) { dst[op++] = 255; v -= 255; }
                dst[op++] = (uint8_t)v;
            } else {
                dst[token_pos] = (uint8_t)(lit << 4);
            }
            std::memcpy(dst + op, w + anchor, lit);
            op += lit;
            size_t offset = ip - (size_t)cand;
            dst[op++] = (uint8_t)(offset & 0xFF);
            dst[op++] = (uint8_t)(offset >> 8);
            if (ml_token >= 15) {
                dst[token_pos] |= 15;
                size_t v = ml_token - 15;
                while (v >= 255) { dst[op++] = 255; v -= 255; }
                dst[op++] = (uint8_t)v;
            } else {
                dst[token_pos] |= (uint8_t)ml_token;
            }
        }

        ip += mlen;
        anchor = ip;
        if (ip >= mflimit)
            return emit_final_literals(w, anchor, n, dst, cap, op);

        uint32_t seq2 = read32le(w + ip - 2);
        table[hash4(seq2)] = base + (int64_t)ip - 1;
    }
}

int64_t lz4tpu_compress_fast(const uint8_t* src, size_t n, uint8_t* dst,
                             size_t cap, int accel) {
    if (n > 0x7E000000u) return ERR_INPUT_TOO_LARGE;
    if (n == 0) return 0;
    if (n < MFLIMIT + 1)
        return emit_final_literals(src, 0, n, dst, cap, 0);
    int64_t table[1 << HASHLOG];
    std::memset(table, 0, sizeof(table));
    return compress_window(src, n, 0, accel, dst, cap, table, 0, 0);
}

// Streaming entry: caller owns the table (4096 x int64 storing
// base + pos + 1 in global stream coordinates).
int64_t lz4tpu_compress_window(const uint8_t* window, size_t wlen,
                               size_t start, int accel, uint8_t* dst,
                               size_t cap, int64_t* table, int64_t base,
                               int64_t window_floor) {
    if (wlen - start > 0x7E000000u) return ERR_INPUT_TOO_LARGE;
    if (wlen == start) return 0;
    if (wlen - start < MFLIMIT + 1)
        return emit_final_literals(window, start, wlen, dst, cap, 0);
    return compress_window(window, wlen, start, accel, dst, cap, table,
                           base, window_floor);
}

// ---------------------------------------------------------------------
// Generic decompressor (mirrors ops/block.py::_decompress_generic)
// ---------------------------------------------------------------------

int64_t lz4tpu_decompress_generic(const uint8_t* src, size_t n,
                                  uint8_t* dst, size_t cap,
                                  int64_t target,          // -1 = full
                                  const uint8_t* prefix, size_t plen,
                                  const uint8_t* dict, size_t dlen) {
    if (n == 0) return 0;
    if (cap == 0) return 0;
    size_t full_target = (target < 0) ? cap
                         : ((size_t)target < cap ? (size_t)target : cap);
    size_t ip = 0, op = 0;
    bool partial = target >= 0;

    while (ip < n) {
        uint8_t token = src[ip++];
        size_t lit = token >> 4;
        if (lit == 15) {
            for (;;) {
                if (ip >= n) return ERR_CORRUPT;
                uint8_t x = src[ip++];
                lit += x;
                if (x != 255) break;
            }
        }
        if (lit) {
            if (ip + lit > n) return ERR_CORRUPT;
            size_t room = full_target - op;
            if (lit > room) {
                if (!partial) return ERR_OUTPUT_TOO_SMALL;
                std::memcpy(dst + op, src + ip, room);
                return (int64_t)(op + room);
            }
            std::memcpy(dst + op, src + ip, lit);
            ip += lit; op += lit;
        }
        if (ip >= n) break;

        if (ip + 2 > n) return ERR_CORRUPT;
        size_t offset = read16le(src + ip);
        ip += 2;
        if (offset == 0) return ERR_CORRUPT;

        size_t ml = token & 15;
        if (ml == 15) {
            for (;;) {
                if (ip >= n) return ERR_CORRUPT;
                uint8_t x = src[ip++];
                ml += x;
                if (x != 255) break;
            }
        }
        ml += MINMATCH;

        size_t room = full_target - op;
        bool clamped = ml > room;
        if (clamped && !partial) return ERR_OUTPUT_TOO_SMALL;
        size_t take = clamped ? room : ml;

        if (offset <= op) {
            size_t mpos = op - offset;
            if (offset >= take) {
                std::memmove(dst + op, dst + mpos, take);
                op += take;
            } else {
                for (size_t k = 0; k < take; ++k)
                    dst[op + k] = dst[mpos + k];
                op += take;
            }
        } else if (offset <= op + plen) {
            size_t back = offset - op;
            size_t from_prefix = back < take ? back : take;
            std::memcpy(dst + op, prefix + plen - back, from_prefix);
            op += from_prefix;
            size_t rest = take - from_prefix;
            // source index (op + k) - offset is >= 0 here because the
            // prefix bytes were just materialized into dst
            for (size_t k = 0; k < rest; ++k)
                dst[op + k] = dst[(op + k) - offset];
            op += rest;
        } else if (offset <= op + plen + dlen) {
            size_t back = offset - op - plen;
            size_t from_dict = back < take ? back : take;
            std::memcpy(dst + op, dict + dlen - back, from_dict);
            op += from_dict;
            size_t rest = take - from_dict;
            size_t from_pref = rest < plen ? rest : plen;
            std::memcpy(dst + op, prefix, from_pref);
            op += from_pref;
            rest -= from_pref;
            for (size_t k = 0; k < rest; ++k)
                dst[op + k] = dst[(op + k) - offset];
            op += rest;
        } else {
            return ERR_CORRUPT;
        }
        if (clamped) return (int64_t)op;
    }
    return (int64_t)op;
}

int64_t lz4tpu_decompress_safe(const uint8_t* src, size_t n, uint8_t* dst,
                               size_t cap) {
    return lz4tpu_decompress_generic(src, n, dst, cap, -1, nullptr, 0,
                                     nullptr, 0);
}

// ---------------------------------------------------------------------
// Sequence parser for the TPU decode path (host side of two-phase
// decode; the device does the gather-heavy reconstruction).
// ---------------------------------------------------------------------

int64_t lz4tpu_parse_sequences(const uint8_t* comp, size_t n,
                               int32_t* lit, int32_t* lsrc, int32_t* ml,
                               int32_t* off, size_t cap,
                               size_t history_len) {
    size_t ip = 0, op = 0, q = 0;
    while (ip < n) {
        if (q >= cap) return ERR_CORRUPT;
        uint8_t token = comp[ip++];
        size_t l = token >> 4;
        if (l == 15) {
            for (;;) {
                if (ip >= n) return ERR_CORRUPT;
                uint8_t x = comp[ip++];
                l += x;
                if (x != 255) break;
            }
        }
        if (ip + l > n) return ERR_CORRUPT;
        lit[q] = (int32_t)l;
        lsrc[q] = (int32_t)ip;
        ip += l; op += l;
        if (ip >= n) {
            ml[q] = 0; off[q] = 1; ++q;
            break;
        }
        if (ip + 2 > n) return ERR_CORRUPT;
        size_t o = read16le(comp + ip);
        ip += 2;
        if (o == 0 || o > op + history_len) return ERR_CORRUPT;
        size_t m = token & 15;
        if (m == 15) {
            for (;;) {
                if (ip >= n) return ERR_CORRUPT;
                uint8_t x = comp[ip++];
                m += x;
                if (x != 255) break;
            }
        }
        m += MINMATCH;
        op += m;
        ml[q] = (int32_t)m;
        off[q] = (int32_t)o;
        ++q;
    }
    return (int64_t)q;
}

// Batched block parse: one call for a whole frame's worth of blocks.
// comp = concatenated payloads; offs[i]/lens[i] delimit block i.
// Outputs are [nblocks, nseq_cap] row-major int32 arrays + per-block
// sequence counts.  Returns 0, or -(block_index+1) on corruption.
int64_t lz4tpu_parse_blocks(const uint8_t* comp, const int64_t* offs,
                            const int64_t* lens, size_t nblocks,
                            int32_t* lit, int32_t* lsrc, int32_t* ml,
                            int32_t* off, int32_t* nseq,
                            size_t nseq_cap, size_t history_len) {
    for (size_t bi = 0; bi < nblocks; ++bi) {
        int64_t r = lz4tpu_parse_sequences(
            comp + offs[bi], (size_t)lens[bi],
            lit + bi * nseq_cap, lsrc + bi * nseq_cap,
            ml + bi * nseq_cap, off + bi * nseq_cap, nseq_cap,
            history_len);
        if (r < 0) return -(int64_t)(bi + 1);
        nseq[bi] = (int32_t)r;
    }
    return 0;
}

// ---------------------------------------------------------------------
// Fragment resolution for round-free device decode.
//
// Resolves every match in a compressed block to ABSOLUTE literal
// sources (following the LZ77 reference chain on the host, where
// chasing pointers is cheap), so the device reconstruction needs no
// iterative rounds: every output byte is either
//   LIT  fragment (per == 0): out[dst + k] = comp[src + k]
//   PER  fragment (per >  0): out[dst + k] = out[src + (phase+k) % per]
//        where [src, src+per) lies strictly before dst and contains
//        no PER bytes of a LATER round than this fragment's round-1.
// Returns per-block fragment counts, or -1 in nfrag[b] when the
// fragment budget overflows (caller falls back to another decoder).
// ---------------------------------------------------------------------

struct Frag {
    int32_t dst, len, src, per, phase, round;
};

static int64_t resolve_block(const uint8_t* comp, size_t n,
                             Frag* frags, size_t fcap, int32_t* rounds_out) {
    size_t nf = 0;
    size_t ip = 0, op = 0;
    int32_t max_round = 0;

    // binary search: index of fragment covering output position p
    auto find = [&](int32_t p) -> size_t {
        size_t lo = 0, hi = nf;
        while (lo + 1 < hi) {
            size_t mid = (lo + hi) / 2;
            if (frags[mid].dst <= p) lo = mid; else hi = mid;
        }
        return lo;
    };

    while (ip < n) {
        uint8_t token = comp[ip++];
        size_t lit = token >> 4;
        if (lit == 15) {
            for (;;) {
                if (ip >= n) return ERR_CORRUPT;
                uint8_t x = comp[ip++];
                lit += x;
                if (x != 255) break;
            }
        }
        if (ip + lit > n) return ERR_CORRUPT;
        if (lit) {
            if (nf >= fcap) return -1000;
            frags[nf++] = {(int32_t)op, (int32_t)lit, (int32_t)ip,
                           0, 0, 0};
            op += lit; ip += lit;
        }
        if (ip >= n) break;
        if (ip + 2 > n) return ERR_CORRUPT;
        size_t off = read16le(comp + ip);
        ip += 2;
        if (off == 0 || off > op) return ERR_CORRUPT;
        size_t ml = token & 15;
        if (ml == 15) {
            for (;;) {
                if (ip >= n) return ERR_CORRUPT;
                uint8_t x = comp[ip++];
                ml += x;
                if (x != 255) break;
            }
        }
        ml += MINMATCH;

        // head: the non-self-overlapping part, chain-followed
        size_t take = ml < off ? ml : off;
        int32_t s = (int32_t)(op - off);
        int32_t d = (int32_t)op;
        int32_t remaining = (int32_t)take;
        int32_t cur = s;
        while (remaining > 0) {
            size_t fi = find(cur);
            const Frag f = frags[fi];
            int32_t into = cur - f.dst;
            int32_t seg = f.len - into;
            if (seg > remaining) seg = remaining;
            if (nf >= fcap) return -1000;
            if (f.per == 0) {
                frags[nf++] = {d, seg, f.src + into, 0, 0, 0};
            } else {
                int32_t ph = (int32_t)((f.phase + into) % f.per);
                frags[nf++] = {d, seg, f.src, f.per, ph, f.round};
                if (f.round > max_round) max_round = f.round;
            }
            d += seg; cur += seg; remaining -= seg;
        }
        // tail: self-overlap -> periodic fragment over [op, op+off)
        if (ml > take) {
            if (nf >= fcap) return -1000;
            // window [op, op+off) was just emitted as the head; its
            // max round governs ours
            int32_t r = 1;
            for (size_t k = nf; k-- > 0;) {
                if (frags[k].dst < (int32_t)op) break;
                if (frags[k].per && frags[k].round + 1 > r)
                    r = frags[k].round + 1;
            }
            frags[nf++] = {(int32_t)(op + take), (int32_t)(ml - take),
                           (int32_t)op, (int32_t)off, 0, r};
            if (r > max_round) max_round = r;
        }
        op += ml;
    }
    *rounds_out = max_round;
    return (int64_t)nf;
}

int64_t lz4tpu_resolve_blocks(const uint8_t* comp, const int64_t* offs,
                              const int64_t* lens, size_t nblocks,
                              int32_t* fdst, int32_t* flen,
                              int32_t* fsrc, int32_t* fper,
                              int32_t* fphase, int32_t* nfrag,
                              int32_t* rounds, size_t fcap,
                              int64_t* out_lens) {
    Frag* scratch = new Frag[fcap];
    for (size_t bi = 0; bi < nblocks; ++bi) {
        int32_t r = 0;
        int64_t nf = resolve_block(comp + offs[bi], (size_t)lens[bi],
                                   scratch, fcap, &r);
        if (nf == -1000) {            // budget overflow: mark block
            nfrag[bi] = -1;
            rounds[bi] = 0;
            out_lens[bi] = 0;
            continue;
        }
        if (nf < 0) { delete[] scratch; return -(int64_t)(bi + 1); }
        int64_t ol = 0;
        for (int64_t k = 0; k < nf; ++k) {
            fdst[bi * fcap + k] = scratch[k].dst;
            flen[bi * fcap + k] = scratch[k].len;
            fsrc[bi * fcap + k] = scratch[k].src;
            fper[bi * fcap + k] = scratch[k].per;
            fphase[bi * fcap + k] = scratch[k].phase;
            ol = scratch[k].dst + scratch[k].len;
        }
        nfrag[bi] = (int32_t)nf;
        rounds[bi] = r;
        out_lens[bi] = ol;
    }
    delete[] scratch;
    return 0;
}

// Batched one-shot block compress: src = [nblocks, blk] row-major
// (lens[i] valid bytes each); outputs into dst rows of stride dcap.
// Returns 0 or -(block_index+1) on error.
int64_t lz4tpu_compress_blocks(const uint8_t* src, size_t blk,
                               const int64_t* lens, size_t nblocks,
                               uint8_t* dst, size_t dcap,
                               int64_t* out_lens, int accel) {
    int64_t table[1 << HASHLOG];
    for (size_t bi = 0; bi < nblocks; ++bi) {
        std::memset(table, 0, sizeof(table));
        size_t n = (size_t)lens[bi];
        const uint8_t* s = src + bi * blk;
        uint8_t* d = dst + bi * dcap;
        int64_t r;
        if (n == 0) r = 0;
        else if (n < (size_t)MFLIMIT + 1)
            r = emit_final_literals(s, 0, n, d, dcap, 0);
        else
            r = compress_window(s, n, 0, accel, d, dcap, table, 0, 0);
        if (r < 0) return -(int64_t)(bi + 1);
        out_lens[bi] = r;
    }
    return 0;
}

// Batched decompress: comp rows delimited by offs/lens; outputs into
// dst rows of stride blk.  Returns 0 or -(block_index+1).
int64_t lz4tpu_decompress_blocks(const uint8_t* comp, const int64_t* offs,
                                 const int64_t* lens, size_t nblocks,
                                 uint8_t* dst, size_t blk,
                                 int64_t* out_lens) {
    for (size_t bi = 0; bi < nblocks; ++bi) {
        int64_t r = lz4tpu_decompress_generic(
            comp + offs[bi], (size_t)lens[bi], dst + bi * blk, blk,
            -1, nullptr, 0, nullptr, 0);
        if (r < 0) return -(int64_t)(bi + 1);
        out_lens[bi] = r;
    }
    return 0;
}

}  // extern "C"
