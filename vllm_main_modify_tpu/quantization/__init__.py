from vllm_main_modify_tpu.quantization.weights import (Fp8Weight,
                                                       Int4Weight,
                                                       Int8Weight,
                                                       QuantizedWeight,
                                                       matmul)

__all__ = [
    "matmul", "QuantizedWeight", "Int8Weight", "Fp8Weight",
    "Int4Weight"
]
