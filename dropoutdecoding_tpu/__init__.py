"""dropoutdecoding_tpu — a TPU-native JAX framework for Uncertainty-Guided
Dropout Decoding on large vision-language models.

Re-implements the capabilities of the DropoutDecoding reference (an
inference-time decoding method for LVLMs: per-visual-token uncertainty
quantification + an ensemble of K masked decoding contexts aggregated by
majority vote / logit averaging), redesigned for TPU:

- the vision tower + projector + merge + LM prefill run as one jitted XLA
  program;
- visual-token uncertainty (softmax entropy, KL-vs-mean decomposition,
  top-k text-space projection) is a fused kernel over the [L_vis, V] logits;
- the per-step ensemble of K masked contexts is a batched (vmapped) axis
  sharing a single canonical KV cache — no cache copies — with the winner's
  new-token K/V scattered back;
- the whole generation loop is a single `lax.while_loop` program on device.

Layout:
  ops/       low-level numerical ops (norms, rope, attention, uncertainty,
             Pallas kernels with jnp fallbacks)
  models/    pure-functional towers: CLIP-ViT, Llama-family LM, projector,
             Q-Former; LLaVA / LLaVA-NeXT / InstructBLIP compositions
  engine/    KV cache, prefill/decode step programs, generation loops
  decoding/  dropout-mask policies, vote/average aggregation, VCD, beam
  parallel/  device mesh + sharding rules (data/tensor axes)
  evalsuite/ self-contained CHAIR + POPE + caption-metric implementations
  cli/       reference-flag-compatible harnesses (chair_test, pope_test)
  utils/     config dataclasses, PRNG policy, HF checkpoint conversion
"""

__version__ = "0.1.0"
