"""Serving export (tools/export_serving.py): serialize -> deserialize ->
call must reproduce the in-process eval forward bit-exactly, including
with a symbolic batch dimension."""

import numpy as np
import jax
import pytest

from tools.export_serving import build_eval_fwd, export_artifact


@pytest.fixture(scope="module")
def small_fwd():
    # full-size HSIZE=512 compiles minutes on CPU; the mcan genotype at
    # batch 4 is enough to prove the export contract
    fwd, params, example = build_eval_fwd("vqa", "./arch/mcan.json", "", 4)
    return fwd, params, example


def test_export_roundtrip_static(small_fwd):
    from jax import export as jexport
    fwd, params, example = small_fwd
    exp = export_artifact(fwd, params, example, ("cpu",), False)
    rt = jexport.deserialize(exp.serialize())
    got = np.asarray(rt.call(params, example))
    want = np.asarray(jax.jit(fwd)(params, example))
    np.testing.assert_array_equal(got, want)


def test_export_symbolic_batch(small_fwd):
    from jax import export as jexport
    fwd, params, example = small_fwd
    exp = export_artifact(fwd, params, example, ("cpu",), True)
    rt = jexport.deserialize(exp.serialize())
    for bs in (2, 4):
        sub = {k: v[:bs] for k, v in example.items()}
        got = np.asarray(rt.call(params, sub))
        want = np.asarray(jax.jit(fwd)(params, sub))
        assert got.shape[0] == bs
        np.testing.assert_array_equal(got, want)
