// Test-only stub: the reference's ROIAlign.h includes <torch/types.h>;
// everything it needs lives in the ATen stub (see ATen/TensorUtils.h).
#pragma once
#include <ATen/TensorUtils.h>
