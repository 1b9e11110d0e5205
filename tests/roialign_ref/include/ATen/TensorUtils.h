// Test-only ATen API stub (float32, CPU, contiguous) — just enough surface
// for the REFERENCE's vendored detectron2 ROIAlign CPU kernel
// (config_slowfast/detectron2/detectron2/layers/csrc/ROIAlign/
// ROIAlign_cpu.cpp) to compile VERBATIM without torch's C++ headers.
// The kernel math itself (the anonymous-namespace ROIAlignForward /
// ROIAlignBackward templates) compiles untouched from the reference file;
// this stub only replaces the at::Tensor plumbing around it, so the
// resulting library is a genuinely independent numerical oracle for
// tests/test_roi_align.py (VERDICT r4 next #4).
#pragma once

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <initializer_list>
#include <memory>
#include <vector>

namespace at {

struct Device {
  bool is_cpu() const { return true; }
};

struct TensorOptions {};

struct Tensor {
  std::shared_ptr<std::vector<float>> storage;
  std::vector<int64_t> sizes_;
  std::vector<int64_t> strides_;

  Tensor() : storage(std::make_shared<std::vector<float>>()) {}

  bool is_cuda() const { return false; }
  Device device() const { return Device(); }
  int64_t size(int64_t i) const { return sizes_[size_t(i)]; }
  int64_t stride(int64_t i) const { return strides_[size_t(i)]; }
  int64_t numel() const {
    int64_t n = 1;
    for (int64_t s : sizes_) n *= s;
    return n;
  }
  Tensor contiguous() const { return *this; }  // always contiguous here
  template <typename T>
  T* data_ptr() const {
    return const_cast<float*>(storage->data());
  }
  TensorOptions options() const { return TensorOptions(); }
  int scalar_type() const { return 0; }
};

inline std::vector<int64_t> contiguous_strides(
    const std::vector<int64_t>& sizes) {
  std::vector<int64_t> st(sizes.size(), 1);
  for (int i = int(sizes.size()) - 2; i >= 0; --i)
    st[size_t(i)] = st[size_t(i) + 1] * sizes[size_t(i) + 1];
  return st;
}

inline Tensor zeros(std::initializer_list<int64_t> sizes, TensorOptions) {
  Tensor t;
  t.sizes_.assign(sizes.begin(), sizes.end());
  t.strides_ = contiguous_strides(t.sizes_);
  t.storage = std::make_shared<std::vector<float>>(size_t(t.numel()), 0.0f);
  return t;
}

inline Tensor from_data(const float* p, std::vector<int64_t> sizes) {
  Tensor t;
  t.sizes_ = std::move(sizes);
  t.strides_ = contiguous_strides(t.sizes_);
  t.storage =
      std::make_shared<std::vector<float>>(p, p + size_t(t.numel()));
  return t;
}

typedef const char* CheckedFrom;

struct TensorArg {
  Tensor t;
  const char* name;
  int pos;
};

inline void checkAllSameType(CheckedFrom,
                             std::initializer_list<TensorArg>) {}

}  // namespace at

#ifndef AT_ASSERTM
#define AT_ASSERTM(cond, ...)                                       \
  do {                                                              \
    if (!(cond)) {                                                  \
      std::fprintf(stderr, "AT_ASSERTM failed: %s\n", #cond);       \
      std::abort();                                                 \
    }                                                               \
  } while (0)
#endif

#ifndef AT_ERROR
#define AT_ERROR(...)                                   \
  do {                                                  \
    std::fprintf(stderr, "AT_ERROR\n");                 \
    std::abort();                                       \
  } while (0)
#endif

// float-only dispatch: the oracle is driven with float32 tensors
#ifndef AT_DISPATCH_FLOATING_TYPES_AND_HALF
#define AT_DISPATCH_FLOATING_TYPES_AND_HALF(TYPE, NAME, ...) \
  do {                                                       \
    using scalar_t = float;                                  \
    __VA_ARGS__();                                           \
  } while (0)
#endif
