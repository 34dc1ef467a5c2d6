// Golden-vector dump tool for MurmurHash3_x64_128 (seed 0).
//
// Compiled against the reference's boost-free mmh3.cpp
// (/root/reference/mmh3.cpp, itself the public-domain MurmurHash3 by
// Austin Appleby) purely to generate expected (h1, h2) outputs; no
// reference code is copied into this repo.  Regenerate with:
//
//   g++ -O2 -o /tmp/mmh3dump tests/golden/gen_mmh3_golden.cpp \
//       /root/reference/mmh3.cpp -I /root/reference
//   /tmp/mmh3dump > tests/golden/mmh3_golden.csv
//
// Inputs: for every length L in 0..257, the deterministic byte pattern
// b[i] = (L*131 + i*29 + 7) mod 256 — covers all 15 tail cases and
// multi-block bodies.  Plus 256 pseudo-random (xorshift64, seed 42)
// blobs of length 1..300.
#include <cstdint>
#include <cstdio>
#include <vector>
#include "mmh3.h"

static uint64_t xs_state = 42;
static uint64_t xorshift64() {
  uint64_t x = xs_state;
  x ^= x << 13;
  x ^= x >> 7;
  x ^= x << 17;
  xs_state = x;
  return x;
}

static void dump(const std::vector<uint8_t>& buf) {
  hash128_t out = MurmurHash3_x64_128(buf.data(), (int)buf.size(), 0);
  printf("%zu,", buf.size());
  for (uint8_t b : buf) printf("%02x", b);
  printf(",%016llx,%016llx\n", (unsigned long long)out.h1,
         (unsigned long long)out.h2);
}

int main() {
  printf("len,input_hex,h1,h2\n");
  for (int L = 0; L <= 257; L++) {
    std::vector<uint8_t> buf(L);
    for (int i = 0; i < L; i++) buf[i] = (uint8_t)((L * 131 + i * 29 + 7) & 0xff);
    dump(buf);
  }
  for (int t = 0; t < 256; t++) {
    int L = (int)(xorshift64() % 300) + 1;
    std::vector<uint8_t> buf(L);
    for (int i = 0; i < L; i++) buf[i] = (uint8_t)(xorshift64() & 0xff);
    dump(buf);
  }
  return 0;
}
