"""Low-level device kernels: quantization and Pallas scoring paths."""

from wdbx_tpu.kernels.quant import dequantize_rows, quantize_rows

__all__ = ["quantize_rows", "dequantize_rows"]
