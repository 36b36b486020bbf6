// First-party FLAC subset decoder (see flac_decode.cc).
#ifndef CTCASR_FLAC_DECODE_H_
#define CTCASR_FLAC_DECODE_H_

#include <cstdint>
#include <vector>

struct FlacData {
  std::vector<float> samples;  // mono downmix, [-1, 1)
  int sample_rate = 0;
  bool ok = false;
};

// Decode an in-memory FLAC stream to mono float32. max_samples > 0
// caps the decoded length (decoding stops early). ok=false on any
// structural error; partial samples up to a truncation are kept.
FlacData flac_decode_buffer(const uint8_t* buf, size_t len,
                            int64_t max_samples);

#endif  // CTCASR_FLAC_DECODE_H_
