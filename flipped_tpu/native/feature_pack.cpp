// Native host-side batch assembly for the input pipeline.
//
// The reference's data layer does per-item Python loops for frame
// downsampling and label masking (reference: dataloader/nextqa.py:71-82,
// base_dataset.py:63-95). On a TPU VM the host CPU feeds the chip; these
// kernels assemble whole batches in one C call (contiguous writes, no
// per-item numpy dispatch), exposed through ctypes with a pure-numpy
// fallback (see native/__init__.py).
//
// Build: scripts/build_native.sh  (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Uniform stride downsampling / zero-padding of variable-length frame
// features into a fixed (n, max_feats, dim) batch buffer.
//   frames:  concatenated per-item features, row-major (sum(lengths), dim)
//   offsets: per-item start row into `frames` (n)
//   lengths: per-item frame counts (n)
//   out:     (n, max_feats, dim) zero-initialized by callee
//   out_len: per-item effective lengths (n)
// Sampling index matches the reference: (j * len) / max_feats.
void pack_features_batch(const float* frames, const int64_t* offsets,
                         const int64_t* lengths, int64_t n,
                         int64_t max_feats, int64_t dim, float* out,
                         int64_t* out_len) {
  for (int64_t i = 0; i < n; ++i) {
    const float* src = frames + offsets[i] * dim;
    float* dst = out + i * max_feats * dim;
    const int64_t len = lengths[i];
    if (len > max_feats) {
      for (int64_t j = 0; j < max_feats; ++j) {
        const int64_t row = (j * len) / max_feats;
        std::memcpy(dst + j * dim, src + row * dim, dim * sizeof(float));
      }
      out_len[i] = max_feats;
    } else {
      std::memcpy(dst, src, len * dim * sizeof(float));
      std::memset(dst + len * dim, 0, (max_feats - len) * dim * sizeof(float));
      out_len[i] = len;
    }
  }
}

// LM label construction for a batch of padded token rows:
//   text_id  (n, s): padded with -1 (placeholders -2)
//   prefix   (n):    supervision start per row
//   labels   (n, s) out: 0 before prefix / at padding, token id otherwise
//   mask     (n, s) out: 1.0 where supervised
//   clean_id (n, s) out: text ids with negatives zeroed
// (reference: base_dataset.py:63-77, 97-104)
void pack_lm_labels(const int32_t* text_id, const int64_t* prefix, int64_t n,
                    int64_t s, int32_t* labels, float* mask,
                    int32_t* clean_id) {
  for (int64_t i = 0; i < n; ++i) {
    const int32_t* row = text_id + i * s;
    int32_t* lab = labels + i * s;
    float* m = mask + i * s;
    int32_t* cid = clean_id + i * s;
    const int64_t p = std::min<int64_t>(prefix[i], s);
    for (int64_t t = 0; t < s; ++t) {
      const int32_t tok = row[t];
      cid[t] = tok >= 0 ? tok : 0;
      const bool supervised = (t >= p) && (tok >= 0);
      lab[t] = supervised ? tok : 0;
      m[t] = supervised ? 1.0f : 0.0f;
    }
  }
}

}  // extern "C"
