"""Vocabulary + keyframe database tests."""
import numpy as np
import jax.numpy as jnp

from multiagent_orb_slam2_tpu.vocab import bow as bow_mod
from multiagent_orb_slam2_tpu.vocab import kfdb as kfdb_mod


def random_descs(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def perturb(rng, descs, n_bits):
    """Flip n_bits random bits in each descriptor."""
    out = descs.copy()
    for i in range(len(out)):
        for _ in range(n_bits):
            w = rng.integers(0, 8)
            b = rng.integers(0, 32)
            out[i, w] ^= np.uint32(1) << np.uint32(b)
    return out


class TestVocabulary:
    def test_train_and_transform(self):
        rng = np.random.default_rng(0)
        descs = random_descs(rng, 2000)
        vocab = bow_mod.train_vocabulary(descs, k=5, depth=3, seed=1)
        assert vocab.n_words == 125
        words = bow_mod.transform_words(vocab, jnp.asarray(descs[:100]),
                                        jnp.ones(100, bool))
        words = np.asarray(words)
        assert words.min() >= 0 and words.max() < 125
        # similar descriptors map to the same word most of the time
        near = perturb(rng, descs[:100], 8)
        words2 = np.asarray(bow_mod.transform_words(
            vocab, jnp.asarray(near), jnp.ones(100, bool)))
        assert (words == words2).mean() > 0.5

    def test_bow_similarity_ranking(self):
        """A frame must score higher against a noisy copy of itself than
        against unrelated frames."""
        rng = np.random.default_rng(2)
        corpus = random_descs(rng, 4000)
        vocab = bow_mod.train_vocabulary(corpus, k=6, depth=3, seed=3)
        frames = [random_descs(rng, 150) for _ in range(6)]
        vecs = []
        for f in frames:
            w = bow_mod.transform_words(vocab, jnp.asarray(f), jnp.ones(150, bool))
            vecs.append(bow_mod.bow_vector(vocab, w, jnp.ones(150, bool)))
        db = jnp.stack(vecs)
        # query = noisy version of frame 0
        q = perturb(rng, frames[0], 10)
        wq = bow_mod.transform_words(vocab, jnp.asarray(q), jnp.ones(150, bool))
        vq = bow_mod.bow_vector(vocab, wq, jnp.ones(150, bool))
        scores = np.asarray(bow_mod.l1_score(vq, db))
        assert scores.argmax() == 0
        # margin is modest with a tiny 216-word test vocabulary; real vocabs
        # (10^4+ words) separate much more strongly
        assert scores[0] > 1.3 * np.sort(scores)[-2]

    def test_save_load_roundtrip(self, tmp_path):
        rng = np.random.default_rng(4)
        vocab = bow_mod.train_vocabulary(random_descs(rng, 500), k=4, depth=2)
        p = str(tmp_path / "voc.npz")
        bow_mod.save_vocabulary(vocab, p)
        v2 = bow_mod.load_vocabulary(p)
        assert v2.k == vocab.k and v2.depth == vocab.depth
        d = jnp.asarray(random_descs(rng, 50))
        np.testing.assert_array_equal(
            bow_mod.transform_words(vocab, d, jnp.ones(50, bool)),
            bow_mod.transform_words(v2, d, jnp.ones(50, bool)))


class TestKFDatabase:
    def test_loop_candidate_detection(self):
        """KFs 0..9 in the database; query resembles KF 2; KFs 1-3 are the
        query's covisible set and must be excluded -> best candidate from
        elsewhere only if it shares words."""
        rng = np.random.default_rng(5)
        corpus = random_descs(rng, 4000)
        vocab = bow_mod.train_vocabulary(corpus, k=6, depth=3, seed=6)
        K = 16
        db = kfdb_mod.empty_database(K, vocab)
        frames = [random_descs(rng, 120) for _ in range(10)]
        frames[7] = perturb(rng, frames[2], 6)  # KF 7 revisits KF 2's place
        for i, f in enumerate(frames):
            db, _, _ = kfdb_mod.add_keyframe(db, vocab, i,
                                             jnp.asarray(f),
                                             jnp.ones(120, bool))
        covis = jnp.zeros((K, K), jnp.int32)
        covis = covis.at[2, 1].set(50).at[1, 2].set(50)
        covis = covis.at[2, 3].set(40).at[3, 2].set(40)

        # query with KF 2's own content (as its loop query would)
        q = perturb(rng, frames[2], 4)
        wq = bow_mod.transform_words(vocab, jnp.asarray(q), jnp.ones(120, bool))
        vq = bow_mod.bow_vector(vocab, wq, jnp.ones(120, bool))
        cand, scores = kfdb_mod.detect_loop_candidates(
            db, vocab, wq, jnp.ones(120, bool), vq,
            covis[2], 2, covis, min_score=0.015)
        cand = np.asarray(cand)
        assert not cand[1] and not cand[2] and not cand[3]  # excluded
        assert cand[7]  # the revisit is found

    def test_reloc_no_exclusion(self):
        rng = np.random.default_rng(8)
        corpus = random_descs(rng, 3000)
        vocab = bow_mod.train_vocabulary(corpus, k=5, depth=3, seed=9)
        K = 8
        db = kfdb_mod.empty_database(K, vocab)
        frames = [random_descs(rng, 100) for _ in range(5)]
        for i, f in enumerate(frames):
            db, _, _ = kfdb_mod.add_keyframe(db, vocab, i, jnp.asarray(f),
                                             jnp.ones(100, bool))
        covis = jnp.zeros((K, K), jnp.int32)
        q = perturb(rng, frames[3], 5)
        wq = bow_mod.transform_words(vocab, jnp.asarray(q), jnp.ones(100, bool))
        vq = bow_mod.bow_vector(vocab, wq, jnp.ones(100, bool))
        cand, scores = kfdb_mod.detect_reloc_candidates(
            db, wq, jnp.ones(100, bool), vq, covis)
        assert np.asarray(cand)[3]
