"""Tests: vocabulary (training, descent, BoW, text I/O), keyframe
database retrieval, grid mapping, and the streaming contract."""

import numpy as np
import pytest

from orb_slam2_tpu.places.database import KeyFrameDatabase
from orb_slam2_tpu.places.vocabulary import Vocabulary


def random_descs(n, rng):
    return rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint64).astype(
        np.uint32)


@pytest.fixture(scope="module")
def vocab():
    rng = np.random.default_rng(0)
    return Vocabulary.train(random_descs(2000, rng), k=6, L=3, levels_up=1)


class TestVocabulary:
    def test_tree_shape(self, vocab):
        assert vocab.n_words > 100
        # every non-root node has a parent
        assert (vocab.node_parent[1:] >= 0).all()

    def test_descent_determinism(self, vocab):
        rng = np.random.default_rng(1)
        d = random_descs(64, rng)
        valid = np.ones(64, bool)
        n1, w1 = vocab.assign_nodes(d, valid)
        n2, w2 = vocab.assign_nodes(d, valid)
        np.testing.assert_array_equal(n1, n2)
        np.testing.assert_array_equal(w1, w2)
        assert (w1 >= 0).all()
        assert (n1 >= 0).all()

    def test_descent_matches_host_walk(self, vocab):
        """Device descent must equal a reference host tree walk."""
        rng = np.random.default_rng(2)
        d = random_descs(32, rng)
        _, words = vocab.assign_nodes(d, np.ones(32, bool))
        from orb_slam2_tpu.places.vocabulary import _hamming_np

        for i in range(32):
            cur = 0
            while True:
                ch = vocab.node_children[cur]
                ch = ch[ch >= 0]
                if len(ch) == 0:
                    break
                dist = _hamming_np(d[i:i + 1], vocab.node_desc[ch])[0]
                cur = int(ch[np.argmin(dist)])
            assert vocab.word_of_node[cur] == words[i]

    def test_bow_vector_normalized(self, vocab):
        rng = np.random.default_rng(3)
        d = random_descs(128, rng)
        _, w = vocab.assign_nodes(d, np.ones(128, bool))
        ids, weights = vocab.bow_vector(w)
        assert abs(weights.sum() - 1.0) < 1e-5
        assert (np.diff(ids) > 0).all()

    def test_self_similarity(self, vocab):
        rng = np.random.default_rng(4)
        d = random_descs(128, rng)
        _, w = vocab.assign_nodes(d, np.ones(128, bool))
        ids, weights = vocab.bow_vector(w)
        assert Vocabulary.score_l1(ids, weights, ids, weights) \
            == pytest.approx(1.0, abs=1e-5)
        d2 = random_descs(128, np.random.default_rng(5))
        _, w2 = vocab.assign_nodes(d2, np.ones(128, bool))
        ids2, weights2 = vocab.bow_vector(w2)
        cross = Vocabulary.score_l1(ids, weights, ids2, weights2)
        assert cross < 0.9

    def test_text_roundtrip(self, vocab, tmp_path):
        """save_text / load_text reproduce tree descent (ORBvoc.txt
        format, ref: TemplatedVocabulary.h:1338)."""
        p = tmp_path / "voc.txt"
        vocab.save_text(str(p))
        v2 = Vocabulary.load_text(str(p), levels_up=1)
        assert v2.k == vocab.k and v2.L == vocab.L
        assert v2.n_words == vocab.n_words
        rng = np.random.default_rng(6)
        d = random_descs(64, rng)
        _, w1 = vocab.assign_nodes(d, np.ones(64, bool))
        _, w2 = v2.assign_nodes(d, np.ones(64, bool))
        # word ids are renumbered consistently: the partition must match
        assert len(np.unique(w1)) == len(np.unique(w2))
        m1 = {}
        for a, b in zip(w1, w2):
            assert m1.setdefault(a, b) == b

    def test_load_text_real_scale_k10_L6(self, tmp_path):
        """Loader + device descent at the real ORBvoc geometry: k=10,
        L=6, >100k nodes, ragged (some branches stop early, exercising
        the early-leaf carry in descend and the levels_up=4 recording
        depth; ref: TemplatedVocabulary.h:1218-1256)."""
        rng = np.random.default_rng(7)
        k, L = 10, 6
        parents, descs = [], []   # node ids = index+1, file order
        # depth-1..4: full 10-ary fanout from a root subset kept small
        # enough for CI (6 children at depth 1 -> ~111k nodes total)
        frontier = [0]
        n_next = [6, 10, 10, 10]   # fanout per depth for depths 1..4
        for depth in range(4):
            new = []
            for p in frontier:
                for _ in range(n_next[depth]):
                    nid = len(parents) + 1
                    parents.append(p)
                    new.append(nid)
            frontier = new
        # depth 5: ragged — 70% of depth-4 nodes get 10 children,
        # the rest become early leaves
        deep = []
        for p in frontier:
            if rng.random() < 0.7:
                for _ in range(k):
                    nid = len(parents) + 1
                    parents.append(p)
                    deep.append(nid)
        # depth 6: half the depth-5 nodes get 3 children (leaves)
        for p in deep:
            if rng.random() < 0.5:
                for _ in range(3):
                    parents.append(p)
        n = len(parents)
        assert n > 100_000, n
        by = rng.integers(0, 256, (n, 32), np.uint8)
        w = rng.uniform(0, 1, n)
        lines = [f"{10} {6} 0 0"]
        cols = np.empty((n, 35), object)
        cols[:, 0] = parents
        cols[:, 1] = 0   # fixed below
        cols[:, 2:34] = by
        cols[:, 34] = np.round(w, 6)
        has_child = np.zeros(n + 1, bool)
        has_child[parents] = True
        cols[:, 1] = (~has_child[1:]).astype(int)
        path = tmp_path / "bigvoc.txt"
        import io, time
        buf = io.StringIO()
        buf.write(lines[0] + "\n")
        np.savetxt(buf, cols, fmt="%s", delimiter=" ")
        path.write_text(buf.getvalue())

        t0 = time.perf_counter()
        voc = Vocabulary.load_text(str(path), levels_up=4)
        t_load = time.perf_counter() - t0
        assert voc.k == 10 and voc.L == 6
        assert voc.n_words == int((~has_child[1:]).sum())

        d = random_descs(512, rng)
        valid = np.ones(512, bool)
        t0 = time.perf_counter()
        node_mid, words = voc.assign_nodes(d, valid)
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        voc.assign_nodes(d, valid)
        t_steady = time.perf_counter() - t0
        print(f"[vocab-scale] n_nodes={n} load={t_load:.2f}s "
              f"descend first={t_first:.2f}s steady={t_steady*1e3:.1f}ms")
        assert (words >= 0).all() and (words < voc.n_words).all()
        assert (node_mid >= 0).all()
        # every reached leaf really is a leaf; spot-check host walk parity
        leaves = voc.leaf_of_word[words]
        assert voc.is_leaf[leaves].all()
        from orb_slam2_tpu.places.vocabulary import _hamming_np
        for i in range(0, 512, 64):
            cur = 0
            while True:
                ch = voc.node_children[cur]
                ch = ch[ch >= 0]
                if len(ch) == 0:
                    break
                dist = _hamming_np(d[i:i + 1], voc.node_desc[ch])[0]
                cur = int(ch[np.argmin(dist)])
            assert voc.word_of_node[cur] == words[i]

    def test_load_text_rejects_malformed(self, tmp_path):
        p = tmp_path / "bad.txt"
        p.write_text("10 6 0 0\n0 1 1 2 3\n")   # wrong column count
        with pytest.raises(ValueError):
            Vocabulary.load_text(str(p))


class _FakeStore:
    """Minimal store protocol for database tests."""

    def __init__(self, n):
        self.kf_valid = np.ones(n, bool)
        self.covis = {i: {} for i in range(n)}

    def best_covisibles(self, kf, k):
        c = self.covis.get(kf, {})
        return sorted(c, key=c.get, reverse=True)[:k]


class TestKeyFrameDatabase:
    def test_reloc_candidates_find_twin(self, vocab):
        rng = np.random.default_rng(7)
        store = _FakeStore(6)
        db = KeyFrameDatabase(vocab)
        base = random_descs(120, rng)
        words = []
        for i in range(6):
            d = base.copy() if i == 3 else random_descs(120, rng)
            _, w = vocab.assign_nodes(d, np.ones(len(d), bool))
            words.append(w)
            db.add(i, w)
        # query with kf 3's exact descriptors
        cands = db.detect_reloc_candidates(words[3], store)
        assert 3 in cands

    def test_loop_candidates_exclude_covisible(self, vocab):
        rng = np.random.default_rng(8)
        store = _FakeStore(4)
        db = KeyFrameDatabase(vocab)
        base = random_descs(120, rng)
        for i in range(4):
            _, w = vocab.assign_nodes(base, np.ones(len(base), bool))
            db.add(i, w)
        store.covis[3] = {2: 50}     # 2 covisible with the query
        ids, weights = db.bow[3]
        cands = db.detect_loop_candidates(
            3, 0.01, store, ids=ids, weights=weights)
        assert 2 not in cands
        assert any(c in (0, 1) for c in cands)

    def test_erase(self, vocab):
        rng = np.random.default_rng(9)
        db = KeyFrameDatabase(vocab)
        d = random_descs(50, rng)
        _, w = vocab.assign_nodes(d, np.ones(50, bool))
        db.add(0, w)
        db.erase(0)
        assert 0 not in db.bow
        assert all(0 not in s for s in db.inverted.values())


class TestGridMap:
    def _store_with_wall(self):
        from orb_slam2_tpu.slam.map_store import FrameFeatures, MapStore

        n = 8
        m = MapStore(n, kf_cap=4, pt_cap=64)
        ff = FrameFeatures(
            xy=np.zeros((n, 2), np.float32),
            xy_raw=np.zeros((n, 2), np.float32),
            ur=np.full(n, 1.0, np.float32),
            depth=np.full(n, 1.0, np.float32),
            octave=np.zeros(n, np.int32),
            angle=np.zeros(n, np.float32),
            desc=np.zeros((n, 8), np.uint32),
            valid=np.ones(n, bool),
            node=np.full(n, -1, np.int32),
            word=np.full(n, -1, np.int32),
        )
        kf = m.add_keyframe(ff, np.eye(4, dtype=np.float32), 0.0, 0)
        # wall of points at z = 5, x in [-2, 2]
        for i, x in enumerate(np.linspace(-2, 2, n)):
            pid = m.add_point(np.array([x, 0.0, 5.0]), kf, ff.desc[i])
            m.add_observation(pid, kf, i)
        return m

    def test_grid_builds_free_and_occupied(self):
        from orb_slam2_tpu.mapping2d.gridmap import GridMapper, GridParams

        m = self._store_with_wall()
        p = GridParams(scale_factor=2.0, cloud_min_x=-10, cloud_max_x=10,
                       cloud_min_z=-10, cloud_max_z=10)
        g = GridMapper(m, p)
        g.update_keyframe(0)
        occ = g.occupancy()
        h, w = occ.shape
        # camera cell at world (0,0) -> cell (20, 20); wall at z=5 ->
        # row 30: free cells along the rays, occupied at the wall
        assert (occ == 255).sum() > 5, "expected free cells"
        assert (occ[30] == 0).sum() >= 4, "expected occupied wall cells"
        # behind the wall stays unknown
        assert (occ[35] == 128).all()

    def test_save_grid_map_tum_matches_reference_semantics(self, tmp_path):
        """Cell-for-cell golden: the vectorized save_grid_map_tum must
        reproduce a direct scalar transliteration of the reference's
        SaveGridMapTUM loops (src/System.cc:481-629), including C int
        truncation, the coordinate-mixing endpoint-exchange quirk, and
        flat-buffer index aliasing."""
        from orb_slam2_tpu.mapping2d.gridmap import save_grid_map_tum
        from orb_slam2_tpu.slam.map_store import FrameFeatures, MapStore

        rng = np.random.default_rng(3)
        n = 16
        m = MapStore(n)
        ff = FrameFeatures(
            xy=np.zeros((n, 2), np.float32),
            xy_raw=np.zeros((n, 2), np.float32),
            ur=np.full(n, 1.0, np.float32),
            depth=np.full(n, 1.0, np.float32),
            octave=np.zeros(n, np.int32),
            angle=np.zeros(n, np.float32),
            desc=np.zeros((n, 8), np.uint32),
            valid=np.ones(n, bool),
            node=np.full(n, -1, np.int32),
            word=np.full(n, -1, np.int32),
        )
        centers = [(-0.5, -1.0, 0.0), (1.0, 0.2, 0.5), (2.5, -2.0, 1.0),
                   (9.0, 9.0, 0.0)]        # last is out of grid range
        kfs = []
        for c in centers:
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = -np.asarray(c, np.float32)   # R=I -> center = c
            kfs.append(m.add_keyframe(ff, T, 0.0, 0))
        # points scattered across (and beyond) the fixed grid window
        pids = []
        for i in range(60):
            p = np.array([rng.uniform(-2.2, 3.6), rng.uniform(-3.2, 1.2),
                          rng.uniform(0, 3)], np.float32)
            pid = m.add_point(p, kfs[i % 3], ff.desc[0])
            for k in range(len(kfs)):
                if rng.random() < 0.6:
                    m.add_observation(pid, kfs[k], i % n)
            pids.append(pid)

        got = tmp_path / "got.pgm"
        save_grid_map_tum(m, str(got))

        # --- independent scalar transliteration of the C code ---
        ul_x, ul_y, res, w_, h_ = -1.5, -2.5, 10, 450, 300
        occup = np.zeros(w_ * h_)
        visit = np.zeros(w_ * h_)

        def cell(v, ul):
            a = int((v - ul) * 1000.0)          # C (int) cast: trunc
            return int(a / res) if a >= 0 else -int(-a / res)

        for pid in m.valid_pt_ids():
            x, y, _ = m.pt_pos[pid]
            gx, gy = cell(float(x), ul_x), cell(float(y), ul_y)
            if not (0 <= gx < w_ and 0 <= gy < h_):
                continue
            occup[gx * h_ + gy] += 1
            for kf, _f in m.obs.items(int(pid)):
                if not m.kf_valid[kf]:
                    continue
                cc = m.camera_center(kf)
                kx, ky = cell(float(cc[0]), ul_x), cell(float(cc[1]), ul_y)
                if not (0 <= kx < w_ and 0 <= ky < h_):
                    continue
                x0, y0, x1, y1 = kx, ky, gx, gy
                steep = abs(y1 - y0) > abs(x1 - x0)
                if steep:
                    x0, y0, x1, y1 = ky, kx, gy, gx
                if x0 > x1:
                    x0, x1, y0, y1 = gy, ky, gx, kx
                deltax = x1 - x0
                deltay = abs(y1 - y0)
                with np.errstate(divide="ignore", invalid="ignore"):
                    deltaerr = np.float64(deltay) / np.float64(deltax)
                err, y = 0.0, y0
                ystep = 1 if y0 < y1 else -1
                for xx in range(x0, x1 + 1):
                    fidx = y * h_ + xx if steep else xx * h_ + y
                    if 0 <= fidx < w_ * h_:
                        visit[fidx] += 1
                    err = err + deltaerr
                    if err >= 0.5:
                        y += ystep
                        err -= 1.0
        lines = ["P2", f"{w_} {h_}", "255"]
        for i in range(h_):
            row = []
            for j in range(w_):
                v = visit[j * h_ + i]
                if v == 0:
                    row.append("230 ")
                    continue
                grey = int(occup[j * h_ + i] / v * 255)
                if grey > 0:
                    grey += 100
                grey = min(grey, 255)
                row.append(f"{255 - grey} ")
            lines.append("".join(row))
        want = "\n".join(lines) + "\n"

        assert got.read_text() == want

    def test_pgm_roundtrip(self, tmp_path):
        from orb_slam2_tpu.mapping2d.gridmap import save_pgm

        g = np.array([[0, 128], [255, 128]], np.uint8)
        p = tmp_path / "g.pgm"
        save_pgm(g, str(p))
        txt = open(p).read().split()
        assert txt[0] == "P2"
        assert txt[1:3] == ["2", "2"]
        vals = list(map(int, txt[4:]))
        assert vals == [0, 128, 255, 128]
