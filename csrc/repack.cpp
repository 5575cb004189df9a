// bitblas_tpu native repack library.
//
// Counterpart of the reference's compiled CPU weight-transform chain
// (OPExecutorCPU runs TVM-llvm-compiled ladder/compress/interleave kernels,
// /root/reference/bitblas/ops/operator.py:529-557) and its C++ test decoders
// (/root/reference/testing/cpp/lop3_type_conversion). Checkpoint repacking
// for a 70B model touches tens of GB; these multithreaded C implementations
// replace the numpy fallbacks in bitblas_tpu/quantization/packing.py.
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 repack.cpp -o librepack.so
// ABI: plain C functions over contiguous row-major buffers.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Run fn(row_begin, row_end) across hardware threads.
template <typename F>
void parallel_rows(int64_t rows, F fn) {
  unsigned n = std::thread::hardware_concurrency();
  if (n == 0) n = 4;
  if (rows < 256 || n == 1) {
    fn(0, rows);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (rows + n - 1) / n;
  for (unsigned t = 0; t < n; ++t) {
    int64_t b = t * chunk, e = std::min<int64_t>(rows, b + chunk);
    if (b >= e) break;
    ts.emplace_back([=] { fn(b, e); });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// Pack unsigned fields (one per byte in `in`) LSB-first into bytes:
// out[r, j] = sum_i in[r, j*e + i] << (bits*i), e = 8/bits.
// Identical to reference general_compress (quantization/utils.py:55-70).
void bb_general_compress(const uint8_t* in, uint8_t* out, int64_t rows,
                         int64_t cols, int bits) {
  const int e = 8 / bits;
  const int64_t pcols = cols / e;
  const uint8_t mask = static_cast<uint8_t>((1 << bits) - 1);
  parallel_rows(rows, [=](int64_t rb, int64_t re) {
    for (int64_t r = rb; r < re; ++r) {
      const uint8_t* src = in + r * cols;
      uint8_t* dst = out + r * pcols;
      for (int64_t j = 0; j < pcols; ++j) {
        uint8_t v = 0;
        for (int i = 0; i < e; ++i)
          v |= static_cast<uint8_t>((src[j * e + i] & mask) << (bits * i));
        dst[j] = v;
      }
    }
  });
}

// Inverse of bb_general_compress.
void bb_general_decompress(const uint8_t* in, uint8_t* out, int64_t rows,
                           int64_t pcols, int bits) {
  const int e = 8 / bits;
  const uint8_t mask = static_cast<uint8_t>((1 << bits) - 1);
  parallel_rows(rows, [=](int64_t rb, int64_t re) {
    for (int64_t r = rb; r < re; ++r) {
      const uint8_t* src = in + r * pcols;
      uint8_t* dst = out + r * pcols * e;
      for (int64_t j = 0; j < pcols; ++j)
        for (int i = 0; i < e; ++i)
          dst[j * e + i] = (src[j] >> (bits * i)) & mask;
    }
  });
}

// Slot-strided N-pack (quantization/packing.pack_nslot): input unsigned
// fields [K, N] (one per byte), output [K, N/e] bytes where within each
// tile of `tile_n` natural columns, byte j holds slots i = column
// i*(tile_n/e) + j.
void bb_pack_nslot(const uint8_t* in, uint8_t* out, int64_t k, int64_t n,
                   int bits, int64_t tile_n) {
  const int e = 8 / bits;
  const int64_t sub = tile_n / e;
  const int64_t tiles = n / tile_n;
  const uint8_t mask = static_cast<uint8_t>((1 << bits) - 1);
  parallel_rows(k, [=](int64_t rb, int64_t re) {
    for (int64_t r = rb; r < re; ++r) {
      const uint8_t* src = in + r * n;
      uint8_t* dst = out + r * (n / e);
      for (int64_t t = 0; t < tiles; ++t) {
        const uint8_t* st = src + t * tile_n;
        uint8_t* dt = dst + t * sub;
        for (int64_t j = 0; j < sub; ++j) {
          uint8_t v = 0;
          for (int i = 0; i < e; ++i)
            v |= static_cast<uint8_t>((st[i * sub + j] & mask) << (bits * i));
          dt[j] = v;
        }
      }
    }
  });
}

// Inverse of bb_pack_nslot.
void bb_unpack_nslot(const uint8_t* in, uint8_t* out, int64_t k, int64_t n,
                     int bits, int64_t tile_n) {
  const int e = 8 / bits;
  const int64_t sub = tile_n / e;
  const int64_t tiles = n / tile_n;
  const uint8_t mask = static_cast<uint8_t>((1 << bits) - 1);
  parallel_rows(k, [=](int64_t rb, int64_t re) {
    for (int64_t r = rb; r < re; ++r) {
      const uint8_t* src = in + r * (n / e);
      uint8_t* dst = out + r * n;
      for (int64_t t = 0; t < tiles; ++t) {
        const uint8_t* st = src + t * sub;
        uint8_t* dt = dst + t * tile_n;
        for (int64_t j = 0; j < sub; ++j)
          for (int i = 0; i < e; ++i)
            dt[i * sub + j] = (st[j] >> (bits * i)) & mask;
      }
    }
  });
}

// GPTQ qzeros unpack: int32-packed fields along the last axis; v1 adds 1
// before masking (the AutoGPTQ quirk, reference module/__init__.py:24-58).
void bb_unpack_qzeros(const int32_t* in, int8_t* out, int64_t rows,
                      int64_t pcols, int bits, int add_one) {
  const int e = 32 / bits;
  const int32_t mask = (1 << bits) - 1;
  parallel_rows(rows, [=](int64_t rb, int64_t re) {
    for (int64_t r = rb; r < re; ++r) {
      const int32_t* src = in + r * pcols;
      int8_t* dst = out + r * pcols * e;
      for (int64_t j = 0; j < pcols; ++j)
        for (int i = 0; i < e; ++i) {
          int32_t field = (src[j] >> (bits * i));
          dst[j * e + i] =
              static_cast<int8_t>(((field & 0xFF) + add_one) & mask);
        }
    }
  });
}

// Transpose [rows, cols] bytes -> [cols, rows] (the K-major flip in
// unpacked_weight_to_device), blocked for cache friendliness.
void bb_transpose_u8(const uint8_t* in, uint8_t* out, int64_t rows,
                     int64_t cols) {
  constexpr int64_t B = 64;
  parallel_rows((rows + B - 1) / B, [=](int64_t bb, int64_t be) {
    for (int64_t rb = bb * B; rb < be * B && rb < rows; rb += B) {
      int64_t rmax = std::min(rows, rb + B);
      for (int64_t cb = 0; cb < cols; cb += B) {
        int64_t cmax = std::min(cols, cb + B);
        for (int64_t r = rb; r < rmax; ++r)
          for (int64_t c = cb; c < cmax; ++c)
            out[c * rows + r] = in[r * cols + c];
      }
    }
  });
}

// Clamp+bias signed weights into unsigned fields (reference transform_weight
// int branch, general_matmul/__init__.py:684-690).
void bb_bias_signed(const int8_t* in, uint8_t* out, int64_t count, int bits) {
  const int maxq = 1 << (bits - 1);
  parallel_rows(count, [=](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      int v = in[i];
      if (v < -maxq) v = -maxq;
      if (v > maxq) v = maxq;
      out[i] = static_cast<uint8_t>(static_cast<int8_t>(v + maxq));
    }
  });
}

}  // extern "C"
