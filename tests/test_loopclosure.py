"""Vocabulary / BoW scoring unit tests (reference DBoW3 replacement,
SURVEY.md §2.2 row "DBoW3")."""

import numpy as np
import jax.numpy as jnp

from boslam_tpu.config import LoopConfig, MapConfig, OrbConfig, SlamConfig
from boslam_tpu.loopclosure import empty_loop_state, train_vocab
from boslam_tpu.loopclosure.vocab import _normalize, _tf_histogram
from boslam_tpu.mapping import empty_map

CFG = SlamConfig(
    orb=OrbConfig(n_features=32),
    map=MapConfig(max_keyframes=8, max_points=256),
    loop=LoopConfig(vocab_size=16),
)


def _desc(rng):
    return rng.integers(0, 2**32, (8,), dtype=np.uint32)


def test_idf_sharpens_bow_scores():
    """idf weighting (VERDICT r3 item 7): a 'stopword' descriptor present in
    EVERY keyframe must stop diluting similarity — the genuine-pair margin
    over the best unrelated pair must grow vs tf-only scoring."""
    rng = np.random.default_rng(3)
    K, N = 8, 32
    stop = _desc(rng)          # appears in all keyframes (floor texture)
    distinct = _desc(rng)      # shared ONLY by keyframes 1 and 5

    kf_desc = np.zeros((K, N, 8), np.uint32)
    for k in range(K):
        for s in range(24):
            kf_desc[k, s] = stop
        for s in range(24, 32):
            kf_desc[k, s] = (
                distinct if k in (1, 5) else _desc(rng)
            )
        # Shuffle slot order so the vocabulary's stride-sampled init sees
        # a representative mix of stopword and distinctive descriptors.
        kf_desc[k] = kf_desc[k][rng.permutation(N)]
    st = empty_map(CFG)
    st = st._replace(
        kf_desc=jnp.asarray(kf_desc),
        kf_kp_valid=jnp.ones((K, N), bool),
        kf_valid=jnp.ones(K, bool),
        kf_seq=jnp.arange(K, dtype=jnp.int32),
        n_kf=jnp.asarray(K, jnp.int32),
    )
    loop = train_vocab(CFG, empty_loop_state(CFG), st)

    # Stopword idf ~ 0, distinctive idf ~ ln(9/3): weights actually spread.
    idf = np.asarray(loop.idf)
    assert idf.min() < 0.2 and idf.max() > 0.8

    def margins(bow):
        s = bow @ bow[1]
        others = [float(s[k]) for k in range(K) if k not in (1, 5)]
        return float(s[5]) - max(others)

    m_idf = margins(np.asarray(loop.kf_bow))
    tf_rows = np.stack([
        np.asarray(_normalize(_tf_histogram(
            CFG, loop.vocab, st.kf_desc[k], st.kf_kp_valid[k]
        )))
        for k in range(K)
    ])
    m_tf = margins(tf_rows)
    print(f"[idf] genuine-pair margin: tf-only={m_tf:.3f} tf-idf={m_idf:.3f}")
    assert m_idf > m_tf + 0.1, (m_idf, m_tf)
    assert m_idf > 0.3


def test_idf_roundtrips_compute_bow():
    """compute_bow (per-keyframe insertion path) must score identically to
    the train-time refresh for the same keyframe."""
    from boslam_tpu.loopclosure import compute_bow

    rng = np.random.default_rng(4)
    K, N = 8, 32
    kf_desc = rng.integers(0, 2**32, (K, N, 8), dtype=np.uint32)
    st = empty_map(CFG)
    st = st._replace(
        kf_desc=jnp.asarray(kf_desc),
        kf_kp_valid=jnp.ones((K, N), bool),
        kf_valid=jnp.ones(K, bool),
        kf_seq=jnp.arange(K, dtype=jnp.int32),
        n_kf=jnp.asarray(K, jnp.int32),
    )
    loop = train_vocab(CFG, empty_loop_state(CFG), st)
    loop2 = compute_bow(CFG, loop, st, jnp.asarray(2, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(loop2.kf_bow[2]), np.asarray(loop.kf_bow[2]), atol=1e-5
    )
