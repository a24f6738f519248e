"""TPU op experiments.

The Pallas cell-pair kernels (v1 dense, v2 lane-fused, v3 grid-
pipelined) were pruned in r5 after losing every hardware A/B to the
XLA cell-tile kernel (PERF.md "Pair-kernel A/B": 105.5 / 67.0 /
77.7 ms vs 34.4 ms on the 259k pair pass) -- XLA fuses the
pre-gathered j-planes into the pair physics better than the hand-
managed VMEM pipelines at these tile shapes.  git history (rounds
2-4) holds the kernels and the A/B harness.
"""
