// Native host data path: FASTA parsing + IUPAC encoding.
//
// The reference links libARBDB and uses boost::iostreams for its host
// IO (/root/reference/src/rw_fasta.cpp); here the sequence data path
// is a single-pass C++ scanner producing the framework's packed
// (position, bitmask) arrays directly, callable through ctypes.
//
// Encoding matches sina_tpu/alphabet.py (aligned_base.cpp:70-107
// semantics): 4-bit base bitmask + lowercase bit; '-' and '.' advance
// the column counter without emitting a base; whitespace is skipped.

#include <cstdint>
#include <cstring>

namespace {

struct Tables {
    unsigned char mask[256];
    bool valid[256];   // IUPAC code or gap
    Tables() {
        std::memset(mask, 0, sizeof(mask));
        std::memset(valid, 0, sizeof(valid));
        struct { char c; unsigned char m; } codes[] = {
            {'A', 1},  {'G', 2},  {'C', 4},  {'T', 8},  {'U', 8},
            {'R', 3},  {'Y', 12}, {'K', 10}, {'M', 5},  {'S', 6},
            {'W', 9},  {'B', 14}, {'D', 11}, {'H', 13}, {'V', 7},
            {'N', 15},
        };
        for (auto& cm : codes) {
            mask[(unsigned char)cm.c] = cm.m;
            mask[(unsigned char)(cm.c + 32)] = cm.m | 16;
            valid[(unsigned char)cm.c] = true;
            valid[(unsigned char)(cm.c + 32)] = true;
        }
        valid[(unsigned char)'-'] = true;
        valid[(unsigned char)'.'] = true;
    }
};

const Tables T;

inline bool is_ws(unsigned char c) {
    return c == ' ' || c == '\t' || c == '\r' || c == '\n';
}

}  // namespace

extern "C" {

// Returns 1 if the buffer contains FASTA comment lines (';' at line
// start) — the caller should use the attribute-aware python reader.
long sina_fasta_has_comments(const char* buf, long len) {
    if (len > 0 && buf[0] == ';') return 1;
    for (long i = 1; i < len; ++i) {
        if (buf[i] == ';' && buf[i - 1] == '\n') return 1;
    }
    return 0;
}

// Single-pass FASTA parse.
//
// Outputs (caller-allocated):
//   masks[cap_bases], positions[cap_bases]  packed base data
//   base_offsets[max_recs+1]                per-record base ranges
//   widths[max_recs]                        alignment width per record
//   header_offsets[2*max_recs]              (start, end) byte ranges of
//                                           each '>' header (sans '>')
//   flags[max_recs]                         1 = bad character, skip
//
// Returns the number of records, or -1 if capacities were exceeded.
long sina_parse_fasta(
    const char* buf, long len,
    unsigned char* masks, unsigned int* positions, long cap_bases,
    long* base_offsets, long* widths,
    long* header_offsets, unsigned char* flags, long max_recs) {
    long nrec = -1;       // current record index
    long nbases = 0;
    long width = 0;
    bool in_header = false;
    base_offsets[0] = 0;

    long i = 0;
    while (i < len) {
        char c = buf[i];
        if (c == '>' && (i == 0 || buf[i - 1] == '\n')) {
            if (nrec >= 0) {
                widths[nrec] = width;
                base_offsets[nrec + 1] = nbases;
            }
            ++nrec;
            if (nrec >= max_recs) return -1;
            flags[nrec] = 0;
            width = 0;
            // header spans to end of line
            long start = i + 1;
            long j = start;
            while (j < len && buf[j] != '\n') ++j;
            long end = j;
            if (end > start && buf[end - 1] == '\r') --end;
            header_offsets[2 * nrec] = start;
            header_offsets[2 * nrec + 1] = end;
            i = j + 1;
            continue;
        }
        if (nrec < 0) { ++i; continue; }  // preamble junk
        // sequence data line
        long j = i;
        while (j < len && buf[j] != '\n') {
            unsigned char ch = (unsigned char)buf[j];
            if (!is_ws(ch)) {
                if (!T.valid[ch]) {
                    flags[nrec] = 1;
                } else {
                    unsigned char m = T.mask[ch];
                    if (m != 0) {
                        if (nbases >= cap_bases) return -1;
                        masks[nbases] = m;
                        positions[nbases] = (unsigned int)width;
                        ++nbases;
                    }
                    ++width;
                }
            }
            ++j;
        }
        i = j + 1;
    }
    if (nrec >= 0) {
        widths[nrec] = width;
        base_offsets[nrec + 1] = nbases;
    }
    return nrec + 1;
}

}  // extern "C"
