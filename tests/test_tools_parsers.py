"""Unit tests for the pure parsing helpers in the perf toolbox
(tools/hlo_breakdown.py): FLOPs extraction from StableHLO text lines."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from hlo_breakdown import classify, conv_flops, dot_flops, shapes_of  # noqa


CONV = ("%1 = stablehlo.convolution(%a, %b) dim_numbers = "
        "[b, 0, 1, f]x[0, 1, i, o]->[b, 0, 1, f], window = {stride = [1, 1],"
        " pad = [[1, 1], [1, 1]]} : (tensor<2x64x64x320xbf16>, "
        "tensor<3x3x320x320xbf16>) -> tensor<2x64x64x320xbf16>")
DOT_W = ("%2 = stablehlo.dot_general %x, %w, contracting_dims = [2] x [0] : "
         "(tensor<2x4096x320xbf16>, tensor<320x2560xbf16>) -> "
         "tensor<2x4096x2560xbf16>")
DOT_A = ("%3 = stablehlo.dot_general %q, %k, batching_dims = [0, 1] x "
         "[0, 1], contracting_dims = [3] x [3] : "
         "(tensor<2x8x4096x40xbf16>, tensor<2x8x4096x40xbf16>) -> "
         "tensor<2x8x4096x4096xf32>")


def test_shapes_of():
    assert shapes_of(CONV)[-1] == (2, 64, 64, 320)
    assert shapes_of(DOT_W) == [(2, 4096, 320), (320, 2560), (2, 4096, 2560)]


def test_conv_flops():
    # 2 * out_elems * cin * kh * kw
    assert conv_flops(CONV) == 2 * (2 * 64 * 64 * 320) * 320 * 3 * 3


def test_dot_flops_and_classify():
    assert dot_flops(DOT_W) == 2 * (2 * 4096 * 2560) * 320
    assert classify(DOT_W) == "linear"
    # attention matmul: batched activation x activation
    assert dot_flops(DOT_A) == 2 * (2 * 8 * 4096 * 4096) * 40
    assert classify(DOT_A) == "attn-matmul"
    assert classify(CONV) == "conv3x3"
