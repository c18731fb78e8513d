"""gliclass.c_tpu — TPU-native zero-shot text classification framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of GLiClass.c
(Knowledgator's C/ONNXRuntime inference engine for GLiClass zero-shot
classifiers). The compute path is a from-scratch Flax-free functional encoder
jit-compiled by XLA with Pallas INT8 kernels; the host path keeps the reference's
semantics (prompt format, tokenizer contract, decision rules, JSON job schema).
"""

from .config import BackboneConfig, GLiClassConfig, RuntimeConfig
from .data import ClassificationJob, load_job, parse_job
from .postprocess import LabelScore, TextResult, decide_batch, format_report
from .prompting import pack_prompt, pack_prompts

__version__ = "0.1.0"

__all__ = [
    "BackboneConfig",
    "GLiClassConfig",
    "RuntimeConfig",
    "ClassificationJob",
    "load_job",
    "parse_job",
    "LabelScore",
    "TextResult",
    "decide_batch",
    "format_report",
    "pack_prompt",
    "pack_prompts",
    "__version__",
]
