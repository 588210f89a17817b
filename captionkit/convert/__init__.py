"""PyTorch interop (SURVEY.md §8.1 step 5).

* ``torch_import`` — convert a torch checkpoint's state_dict into
  captionkit parameter pytrees / .npz (the fidelity path for released
  reference checkpoints [B]).
* ``fit_names`` — infer an unknown checkpoint's module layout from
  parameter shapes alone (hint-ranked, ambiguity-enumerating); feeds
  ``torch_import`` and the parity gate's candidate sweep so fitting a
  real released checkpoint needs no by-hand name map.
* ``torch_ref`` — torch (CPU) twin implementations of DCNet/EditNet with
  tutorial-family module naming. They serve two purposes while the real
  reference artifacts are unavailable (empty mount, SURVEY.md §0):
  (1) the parity harness: converted twin checkpoints must reproduce
  captionkit logits step-for-step and identical greedy captions
  (SURVEY.md §5 item 1); (2) the CPU decode-throughput denominator —
  a faithful batch=1 Python-loop beam search in torch, measured by
  bench_reference_cpu.py (BASELINE.md denominator protocol).
"""
