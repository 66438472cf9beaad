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



def _bce_sum(p, target_ones: bool):
    """torch.nn.BCELoss(reduction='sum') on probabilities. Torch clamps the
    log term at -100 (BCELoss docs) so a fully-saturated score gives a
    large finite loss, not inf; an epsilon-clip on p cannot express this in
    fp32 (1 - 1e-12 rounds to 1.0), let alone bf16 — hence fp32 + log
    clamping exactly as torch."""
    p = p.astype(jnp.float32)
    logp = jnp.log(p) if target_ones else jnp.log1p(-p)
    return -jnp.sum(jnp.maximum(logp, -100.0))


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
