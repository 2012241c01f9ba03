// Native FASTQ record scanner + nt4 batch encoder.
//
// Host-IO component of bwa-mem-scale-tpu: the counterpart of the
// reference's kseq.h parser and bseq_read batch assembly (reference:
// src/kseq.h, src/bwa.cpp:266-336). Scans a decompressed text buffer
// for complete 4-line FASTQ records, returning offset/length arrays
// the Python side wraps zero-copy; a second entry point encodes the
// ASCII bases of many records into one padded nt4 code matrix.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libfastq.so fastq.cpp

#include <cstdint>
#include <cstring>

namespace {

using i64 = int64_t;

static inline i64 line_end(const char* buf, i64 i, i64 n) {
    const void* p = memchr(buf + i, '\n', (size_t)(n - i));
    return p ? (const char*)p - buf : -1;
}

}  // namespace

extern "C" {

// Scan up to `cap` complete FASTQ records in buf[0, n).
// Returns the record count; *consumed = offset just past the last
// complete record (the caller re-feeds the remainder). Malformed
// input (record not starting with '@') stops the scan with the
// current count and *err set to the offending offset, else *err = -1.
i64 fastq_scan(const char* buf, i64 n, i64 cap,
               i64* name_off, int32_t* name_len,
               i64* com_off, int32_t* com_len,
               i64* seq_off, int32_t* seq_len,
               i64* qual_off, i64* consumed, i64* err) {
    i64 i = 0, cnt = 0;
    *err = -1;
    while (cnt < cap) {
        // skip blank lines between records
        while (i < n && (buf[i] == '\n' || buf[i] == '\r')) ++i;
        if (i >= n) break;
        if (buf[i] != '@') { *err = i; break; }
        i64 h_end = line_end(buf, i, n);
        if (h_end < 0) break;
        i64 s_beg = h_end + 1;
        i64 s_end = line_end(buf, s_beg, n);
        if (s_end < 0) break;
        i64 p_beg = s_end + 1;
        i64 p_end = line_end(buf, p_beg, n);
        if (p_end < 0) break;
        if (p_beg >= n || buf[p_beg] != '+') { *err = p_beg; break; }
        i64 q_beg = p_end + 1;
        i64 q_end = line_end(buf, q_beg, n);
        if (q_end < 0) break;

        // header: name = first token, comment = rest
        i64 nb = i + 1;
        i64 ne = nb;
        while (ne < h_end && buf[ne] != ' ' && buf[ne] != '\t'
               && buf[ne] != '\r')
            ++ne;
        name_off[cnt] = nb;
        name_len[cnt] = (int32_t)(ne - nb);
        i64 cb = ne;
        while (cb < h_end && (buf[cb] == ' ' || buf[cb] == '\t')) ++cb;
        i64 ce = h_end;
        if (ce > cb && buf[ce - 1] == '\r') --ce;
        com_off[cnt] = cb;
        com_len[cnt] = (int32_t)(ce > cb ? ce - cb : 0);

        i64 se = s_end;
        if (se > s_beg && buf[se - 1] == '\r') --se;
        seq_off[cnt] = s_beg;
        seq_len[cnt] = (int32_t)(se - s_beg);
        qual_off[cnt] = q_beg;
        ++cnt;
        i = q_end + 1;
        *consumed = i;
    }
    if (cnt == 0) *consumed = 0;
    return cnt;
}

// Encode records' ASCII bases into out[nrec * L] nt4 codes, padding
// with 4. Case-insensitive ACGT; anything else is 4 (N).
void fastq_encode(const char* buf, const i64* seq_off,
                  const int32_t* seq_len, i64 nrec, int32_t L,
                  uint8_t* out) {
    static uint8_t tab[256];
    static bool init = false;
    if (!init) {
        memset(tab, 4, sizeof(tab));
        tab['A'] = tab['a'] = 0;
        tab['C'] = tab['c'] = 1;
        tab['G'] = tab['g'] = 2;
        tab['T'] = tab['t'] = 3;
        init = true;
    }
    for (i64 r = 0; r < nrec; ++r) {
        const char* s = buf + seq_off[r];
        int32_t m = seq_len[r] < L ? seq_len[r] : L;
        uint8_t* o = out + r * (i64)L;
        for (int32_t j = 0; j < m; ++j) o[j] = tab[(uint8_t)s[j]];
        for (int32_t j = m; j < L; ++j) o[j] = 4;
    }
}

}  // extern "C"
