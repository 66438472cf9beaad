"""ITM triplet losses (rebuild of mmnas/utils/itm_loss.py).

`bce_triplet_loss` reproduces the reference BCE_Loss: BCE(pos->1) +
BCE(negc->0) + BCE(negi->0), sum reduction, on SIGMOID probabilities (the
net's ITM head already applies sigmoid, full_itm.py:111). The reference
adds `loss_pos` twice (itm_loss.py:22) — replicated under double_pos=True
and documented as a reference quirk (SURVEY.md §7 bug list).

`margin_triplet_loss` is the 0.2-margin hinge alternative
(itm_loss.py:27-37).
"""

from __future__ import annotations

import jax.numpy as jnp



_BCE_EPS = 1e-7  # fp32-representable; bounds |dloss/dp| at 1e7


def _bce_sum(p, target_ones: bool):
    """torch.nn.BCELoss(reduction='sum') on probabilities, computed in fp32.

    Stabilized as log(p + eps): torch keeps the rail finite by clamping the
    log at -100 forward and the backward denominator at 1e-12, but a plain
    log-clamp in JAX still NaNs the gradient at an exactly-saturated score
    (the max picks the constant branch, yet the chain multiplies that zero
    cotangent by log's 1/p = inf — 0*inf = NaN — poisoning the WHOLE
    summed gradient in one step). log(p + eps) keeps forward and backward
    finite AND the rail gradient nonzero (-1/eps, pushing the score off
    the rail), at the cost of the loss saturating at 16.1 instead of
    torch's 100 for |logit| >= ~16.6 — in-range values agree with torch to
    O(eps/p) (tests/test_itm.py parity)."""
    p = p.astype(jnp.float32)
    logp = (jnp.log(p + _BCE_EPS) if target_ones
            else jnp.log1p(_BCE_EPS - p))
    return -jnp.sum(logp)


def bce_triplet_loss(scores_pos, scores_negc, scores_negi,
                     double_pos: bool = True):
    loss_pos = _bce_sum(scores_pos, True)
    loss_negc = _bce_sum(scores_negc, False)
    loss_negi = _bce_sum(scores_negi, False)
    pos_w = 2.0 if double_pos else 1.0
    return pos_w * loss_pos + loss_negc + loss_negi


def margin_triplet_loss(scores_pos, scores_negc, scores_negi,
                        margin: float = 0.2):
    cost_c = jnp.clip(margin + scores_negc - scores_pos, 0.0)
    cost_i = jnp.clip(margin + scores_negi - scores_pos, 0.0)
    return jnp.sum(cost_c) + jnp.sum(cost_i)
