// Test-only ctypes shim over the REFERENCE's detectron2 ROIAlign CPU
// kernel, which is compiled verbatim next to this file (see
// tests/test_roi_align.py::_build_reference_oracle). Flat C ABI so the
// tests can drive it with numpy arrays via ctypes.
#include <ATen/TensorUtils.h>

namespace detectron2 {
at::Tensor ROIAlign_forward_cpu(
    const at::Tensor& input,
    const at::Tensor& rois,
    const float spatial_scale,
    const int pooled_height,
    const int pooled_width,
    const int sampling_ratio,
    bool aligned);
}

extern "C" int ref_roialign_forward(
    const float* input, int batch, int channels, int height, int width,
    const float* rois, int num_rois,
    float spatial_scale, int pooled_h, int pooled_w,
    int sampling_ratio, int aligned,
    float* out /* num_rois * channels * pooled_h * pooled_w */) {
  at::Tensor ti = at::from_data(input, {batch, channels, height, width});
  at::Tensor tr = at::from_data(rois, {num_rois, 5});
  at::Tensor o = detectron2::ROIAlign_forward_cpu(
      ti, tr, spatial_scale, pooled_h, pooled_w, sampling_ratio,
      aligned != 0);
  const float* p = o.data_ptr<float>();
  for (int64_t i = 0; i < o.numel(); ++i) out[i] = p[i];
  return 0;
}
