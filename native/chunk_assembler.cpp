// Native batch assembler for the training data pipeline.
//
// The reference assembles every training batch with a per-sample Python
// loop over numpy slices (common/generators.py:109-155). This C++ kernel
// does the same work — chunk extraction with edge padding, horizontal flip
// augmentation (x negation + left/right joint permutation) — in one pass
// over contiguous memory, keeping the TPU feed path off the Python
// interpreter. Exposed through ctypes (d3dp_tpu/data/native.py).
//
// Layout contract (all float32, C-contiguous):
//   seq_data:   concatenation of all sequences, shape sum(T_i) x J x C
//   seq_offsets:int64[n_seq + 1], frame offsets of each sequence
//   chunks:     int64[n_chunks x 4] = (seq_idx, start, end, flip)
//   out:        float32[n_chunks x L x J x C], L = chunk length (end-start)
//   perm:       int32[J] left/right joint permutation (identity if no flip)
//   flip_sign:  per-channel sign multipliers, float32[C] (e.g. {-1, 1} or
//               {-1, 1, 1}) applied only to flipped chunks

#include <cstdint>
#include <cstring>

extern "C" {

void assemble_chunks(const float* seq_data, const int64_t* seq_offsets,
                     const int64_t* chunks, int64_t n_chunks,
                     int64_t chunk_len, int64_t J, int64_t C,
                     const int32_t* perm, const float* flip_sign,
                     float* out) {
  const int64_t row = J * C;  // one frame
  for (int64_t ci = 0; ci < n_chunks; ++ci) {
    const int64_t seq_i = chunks[ci * 4 + 0];
    const int64_t start = chunks[ci * 4 + 1];
    const int64_t flip = chunks[ci * 4 + 3];
    const int64_t seq_begin = seq_offsets[seq_i];
    const int64_t seq_len = seq_offsets[seq_i + 1] - seq_begin;
    float* dst = out + ci * chunk_len * row;

    for (int64_t f = 0; f < chunk_len; ++f) {
      // edge padding: clamp frame index into [0, seq_len)
      int64_t src_f = start + f;
      if (src_f < 0) src_f = 0;
      if (src_f >= seq_len) src_f = seq_len - 1;
      const float* src = seq_data + (seq_begin + src_f) * row;
      float* drow = dst + f * row;
      if (!flip) {
        std::memcpy(drow, src, sizeof(float) * row);
      } else {
        // permute joints and apply per-channel signs
        for (int64_t j = 0; j < J; ++j) {
          const float* sj = src + perm[j] * C;
          float* dj = drow + j * C;
          for (int64_t c = 0; c < C; ++c) dj[c] = sj[c] * flip_sign[c];
        }
      }
    }
  }
}

}  // extern "C"
