"""Pin the HLO collective parser used by the multi-chip audit
(scripts/collective_stats.py) — the README/BENCH_NOTES ICI-bytes claims
are computed by it, so a parsing regression silently corrupts the
published evidence."""
import importlib.util
import os
import sys


def _load_script():
    path = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                        "collective_stats.py")
    spec = importlib.util.spec_from_file_location("collective_stats", path)
    mod = importlib.util.module_from_spec(spec)
    old_argv = sys.argv
    sys.argv = ["collective_stats.py"]  # no --tpu: stays on the CPU backend
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.argv = old_argv
    return mod


def test_collect_collectives_counts_async_output_only():
    """Async -start ops return (operand, output[, u32 context]); only the
    output element is wire payload. A naive tuple sum double-counts the
    operand and adds the context scalars (found inflating the r5 audit
    by up to 2x per op kind)."""
    cs = _load_script()
    hlo = """
  %cp = (bf16[4,64]{1,0}, bf16[4,64]{1,0}, u32[], u32[]) collective-permute-start(bf16[4,64]{1,0} %x), source_target_pairs={{0,1}}
  %ag = (bf16[4,64]{1,0}, bf16[32,64]{1,0}) all-gather-start(bf16[4,64]{1,0} %y), dimensions={0}
  %ar = bf16[4,64]{1,0} all-reduce(bf16[4,64]{1,0} %z), to_apply=%add
  ROOT %ags = bf16[32,64]{1,0} all-gather(bf16[4,64]{1,0} %w), dimensions={0}
  %rs = f32[4,64]{1,0} reduce-scatter(f32[32,64]{1,0} %v), dimensions={0}
"""
    out = cs.collect_collectives(hlo)
    # async permute: output only (4*64*2), not in+out+2*u32
    assert out["collective-permute"] == {"count": 1, "bytes": 4 * 64 * 2}
    # async + sync all-gather aggregate under one kind, output bytes each
    assert out["all-gather"] == {"count": 2, "bytes": 2 * 32 * 64 * 2}
    assert out["all-reduce"] == {"count": 1, "bytes": 4 * 64 * 2}
    assert out["reduce-scatter"] == {"count": 1, "bytes": 4 * 64 * 4}


def test_shape_bytes_plain_and_tuple():
    cs = _load_script()
    assert cs._shape_bytes("bf16[8,128]{1,0}") == 8 * 128 * 2
    # non-start tuples (e.g. a fusion result) still sum every element
    assert cs._shape_bytes("(f32[2]{0}, s32[3]{0})") == 2 * 4 + 3 * 4
