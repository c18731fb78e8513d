"""Training tests: loss math, single-device overfit, sharded dp x tp step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from gliclass.c_tpu.config import BackboneConfig, GLiClassConfig
from gliclass.c_tpu.models.gliclass import init_gliclass_params
from gliclass.c_tpu.parallel.mesh import make_mesh
from gliclass.c_tpu.training.train import (
    init_sharded_train_state,
    init_train_state,
    make_sharded_train_step,
    make_train_step,
    multilabel_loss,
    shard_batch,
)


def tiny_cfg():
    bb = BackboneConfig(
        model_type="deberta-v2", vocab_size=64, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32, position_buckets=8,
        norm_rel_ebd="layer_norm", share_att_key=True, position_biased_input=False,
    )
    return GLiClassConfig(hidden_size=32, class_token_index=7, backbone=bb)


def make_batch(rng, n=8, s=16, L=4, class_token=7):
    ids = rng.integers(10, 60, size=(n, s)).astype(np.int32)
    # plant L label tokens at fixed positions
    for k in range(L):
        ids[:, 1 + 2 * k] = class_token
    mask = np.ones((n, s), dtype=np.int32)
    targets = (rng.random((n, L)) > 0.5).astype(np.float32)
    tmask = np.ones((n, L), dtype=bool)
    return (
        jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(targets), jnp.asarray(tmask),
    )


def test_loss_masking_and_focal():
    logits = jnp.asarray([[2.0, -2.0, 5.0]])
    targets = jnp.asarray([[1.0, 0.0, 0.0]])
    mask_all = jnp.asarray([[True, True, True]])
    mask_two = jnp.asarray([[True, True, False]])
    l_all = float(multilabel_loss(logits, targets, mask_all))
    l_two = float(multilabel_loss(logits, targets, mask_two))
    # the third slot is a confident wrong prediction; masking it lowers loss
    assert l_two < l_all
    l_focal = float(multilabel_loss(logits, targets, mask_all, 0.25, 2.0))
    assert 0 < l_focal < l_all


def test_overfit_tiny():
    cfg = tiny_cfg()
    params = init_gliclass_params(jax.random.key(0), cfg)
    # 3e-3: 1e-2 overfits to ~5e-4 by step 25 but then oscillates on this
    # 4-sample toy problem, making the final-loss assertion seed-sensitive.
    opt = optax.adamw(3e-3)
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(cfg, opt, max_labels=4))
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    losses, accs = [], []
    for _ in range(60):
        state, metrics = step(state, *batch)
        losses.append(float(metrics["loss"]))
        accs.append(float(metrics["accuracy"]))
    assert min(losses) < losses[0] * 0.2, losses[::12]
    assert np.isfinite(losses).all()
    assert max(accs) > 0.9


@pytest.mark.parametrize("dp,tp", [(2, 4), (8, 1)])
def test_sharded_train_step(dp, tp):
    cfg = tiny_cfg()
    params = init_gliclass_params(jax.random.key(0), cfg)
    opt = optax.adamw(1e-3)
    mesh = make_mesh(dp, tp)
    state = init_sharded_train_state(params, opt, mesh)
    step = make_sharded_train_step(cfg, opt, max_labels=4, mesh=mesh)
    rng = np.random.default_rng(1)
    batch = shard_batch(mesh, *make_batch(rng))
    state, m1 = step(state, *batch)
    state, m2 = step(state, *batch)
    assert np.isfinite(float(m1["loss"])) and float(m2["loss"]) < float(m1["loss"])


def test_sharded_matches_single_device():
    cfg = tiny_cfg()
    params = init_gliclass_params(jax.random.key(0), cfg)
    opt = optax.sgd(1e-2)
    rng = np.random.default_rng(2)
    raw = make_batch(rng)

    s1 = init_train_state(params, opt)
    step1 = jax.jit(make_train_step(cfg, opt, max_labels=4))
    s1, m1 = step1(s1, *raw)

    mesh = make_mesh(2, 4)
    s2 = init_sharded_train_state(params, opt, mesh)
    step2 = make_sharded_train_step(cfg, opt, max_labels=4, mesh=mesh)
    s2, m2 = step2(s2, *shard_batch(mesh, *raw))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    a = np.asarray(s1.params["head"]["text_projector"]["linear_1"]["w"])
    b = np.asarray(s2.params["head"]["text_projector"]["linear_1"]["w"])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_grad_accumulation_matches_full_batch():
    """accum_steps=A over [A*mb] rows == the full-batch step (same optimizer
    update) when microbatches carry equal valid-slot counts — the averaged
    microbatch grads equal the full-batch grad exactly in that regime."""
    cfg = tiny_cfg()
    rng = np.random.default_rng(0)
    params = init_gliclass_params(jax.random.key(0), cfg)
    opt = optax.sgd(1e-2)
    batch = make_batch(rng, n=8)

    step1 = make_train_step(cfg, opt, max_labels=4)
    s_full, m_full = step1(init_train_state(params, opt), *batch)

    step4 = make_train_step(cfg, opt, max_labels=4, accum_steps=4)
    s_acc, m_acc = step4(init_train_state(params, opt), *batch)

    np.testing.assert_allclose(
        float(m_acc["loss"]), float(m_full["loss"]), rtol=1e-5
    )
    flat_f = jax.tree.leaves(s_full.params)
    flat_a = jax.tree.leaves(s_acc.params)
    for a, f in zip(flat_a, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(f), atol=1e-5)
    # indivisible batch fails loudly
    step3 = make_train_step(cfg, opt, max_labels=4, accum_steps=3)
    with pytest.raises(ValueError, match="not divisible"):
        step3(init_train_state(params, opt), *batch)


def test_bf16_train_step_runs_and_learns():
    """Mixed-precision train step (bf16 compute, fp32 params/moments):
    loss must decrease over a few steps on a fixed batch."""
    cfg = tiny_cfg()
    rng = np.random.default_rng(1)
    params = init_gliclass_params(jax.random.key(1), cfg)
    opt = optax.adam(5e-3)
    step = jax.jit(
        make_train_step(cfg, opt, max_labels=4, compute_dtype=jnp.bfloat16)
    )
    state = init_train_state(params, opt)
    batch = make_batch(rng, n=8)
    losses = []
    for _ in range(8):
        state, metrics = step(state, *batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    # params stayed fp32 (true mixed precision, not a downcast)
    assert all(
        a.dtype == jnp.float32 for a in jax.tree.leaves(state.params)
    )


def test_train_data_pipeline_buckets_and_targets(tiny_tokenizer_file):
    """training/data.py: schema checks, bucketed fixed shapes, exactly-once
    coverage, targets aligned with the packed label order."""
    from gliclass.c_tpu.tokenization import PromptTokenizer
    from gliclass.c_tpu.training.data import (
        TrainBatch,
        parse_train_records,
        train_batches,
    )

    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    records = [
        {
            "text": f"fox number {i} " + "jumps " * (i % 6),
            "all_labels": ["science", "sports", "format"],
            "true_labels": ["sports"] if i % 2 else ["science", "format"],
        }
        for i in range(23)
    ]
    examples = parse_train_records(records)
    batches = list(
        train_batches(
            examples, tok, batch_size=4, max_labels=4, max_length=64,
            seq_buckets=(16, 32, 64), encode_chunk=8,
            shuffle_rng=np.random.default_rng(0),
        )
    )
    assert all(isinstance(b, TrainBatch) for b in batches)
    total = sum(b.input_ids.shape[0] for b in batches)
    assert total == 23  # exactly-once, tail emitted
    for b in batches:
        assert b.input_ids.shape[1] in (16, 32, 64)
        assert b.input_ids.shape == b.attention_mask.shape
        assert b.targets.shape == b.target_mask.shape
        assert b.targets.shape[1] == 4
        assert not b.targets[~b.target_mask].any()
        # 3 candidate labels -> exactly 3 valid slots, 1 or 2 positives
        assert (b.target_mask.sum(1) == 3).all()
        assert set(b.targets.sum(1)) <= {1.0, 2.0}

    # schema violations fail loudly
    with pytest.raises(ValueError, match="all_labels"):
        parse_train_records([{"text": "x", "all_labels": []}])
    with pytest.raises(ValueError, match="not in all_labels"):
        parse_train_records(
            [{"text": "x", "all_labels": ["a"], "true_labels": ["b"]}]
        )
    with pytest.raises(ValueError, match="max_labels"):
        list(train_batches(examples, tok, 4, max_labels=2))


def test_train_data_drop_remainder(tiny_tokenizer_file):
    from gliclass.c_tpu.tokenization import PromptTokenizer
    from gliclass.c_tpu.training.data import parse_train_records, train_batches

    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    examples = parse_train_records(
        [
            {"text": "same length text", "all_labels": ["a", "b"],
             "true_labels": ["a"]}
            for _ in range(10)
        ]
    )
    batches = list(
        train_batches(
            examples, tok, batch_size=4, max_labels=2,
            seq_buckets=(32,), drop_remainder=True,
        )
    )
    assert all(b.input_ids.shape[0] == 4 for b in batches)
    assert sum(b.input_ids.shape[0] for b in batches) == 8  # tail dropped
