"""Host-side batch generators for training and evaluation.

Capability + semantics parity with the reference (common/generators.py):
identical chunk boundaries (centred offset), edge padding, horizontal-flip
augmentation (incl. camera distortion sign flips), per-epoch shuffling from a
dedicated np.random.RandomState whose state is checkpointable for exact
resume. Written vectorised-per-batch instead of the reference's per-sample
copy loops, and with an optional fixed-size batch mode (`pad_last`) that
pads the final partial batch and returns a weight mask — XLA recompiles on
shape changes, so the TPU train step wants every batch the same shape.
"""

import numpy as np


def chunk_schedule(seq_lengths, chunk_length, augment):
    """Build the epoch chunk table: one (seq_idx, start, end, flip) row per
    training window, as an (N, 4) int64 array.

    Each sequence of T frames is tiled by ceil(T / chunk_length) windows.
    Their combined span overshoots T; half the overshoot (floor) is shifted
    before frame 0 so the tiling is centred on the sequence (out-of-range
    frames are edge-padded at extraction time). With `augment`, every
    sequence contributes its full window set twice — flip=0 rows first,
    then the same windows with flip=1 — matching the reference's epoch
    population (common/generators.py:41-49) so the shuffled order is
    reproducible from the same RandomState.
    """
    per_seq = []
    for seq_idx, n_frames in enumerate(seq_lengths):
        n_windows = -(-n_frames // chunk_length)  # ceil
        lead = (n_windows * chunk_length - n_frames) // 2
        starts = np.arange(n_windows, dtype=np.int64) * chunk_length - lead
        rows = np.stack(
            [
                np.full(n_windows, seq_idx, np.int64),
                starts,
                starts + chunk_length,
                np.zeros(n_windows, np.int64),
            ],
            axis=1,
        )
        per_seq.append(rows)
        if augment:
            mirrored = rows.copy()
            mirrored[:, 3] = 1
            per_seq.append(mirrored)
    if not per_seq:
        return np.zeros((0, 4), np.int64)
    return np.concatenate(per_seq, axis=0)


class ChunkedGenerator:
    """Training generator: shuffled fixed-length chunks with flip augment.

    (reference: common/generators.py:12-171; dict-keyed 3DHP variant
    common/generators_3dhp.py is subsumed via the optional `keys` argument)
    """

    def __init__(self, batch_size, cameras, poses_3d, poses_2d, chunk_length,
                 pad=0, causal_shift=0, shuffle=True, random_seed=1234,
                 augment=False, kps_left=None, kps_right=None,
                 joints_left=None, joints_right=None, endless=False,
                 pad_last=False, use_native=True):
        assert poses_3d is None or len(poses_3d) == len(poses_2d), (
            len(poses_3d), len(poses_2d))
        assert cameras is None or len(cameras) == len(poses_2d)
        if poses_3d is not None:
            for p2, p3 in zip(poses_2d, poses_3d):
                assert p2.shape[0] == p3.shape[0], (p2.shape, p3.shape)

        self.chunks = chunk_schedule(
            [p.shape[0] for p in poses_2d], chunk_length, augment)
        self.num_batches = -(-len(self.chunks) // batch_size)
        self.batch_size = batch_size
        self.random = np.random.RandomState(random_seed)
        self.shuffle = shuffle
        self.pad = pad
        self.causal_shift = causal_shift
        self.endless = endless
        self.state = None
        self.pad_last = pad_last
        self.chunk_length = chunk_length

        self.cameras = cameras
        self.poses_3d = poses_3d
        self.poses_2d = poses_2d

        self.augment = augment
        self.kps_left = kps_left
        self.kps_right = kps_right
        self.joints_left = joints_left
        self.joints_right = joints_right

        # native (C++) batch assembly of the hot extraction/flip loop
        self._native = None
        if use_native:
            try:
                from d3dp_tpu.data import native

                if native.available():
                    self._native = native
                    self._bank_2d = native.SequenceBank(poses_2d)
                    self._bank_3d = (native.SequenceBank(poses_3d)
                                     if poses_3d is not None else None)
                    J2 = poses_2d[0].shape[1]
                    perm2 = np.arange(J2)
                    if kps_left is not None:
                        perm2[list(kps_left)] = kps_right
                        perm2[list(kps_right)] = kps_left
                    self._perm_2d = perm2
                    self._sign_2d = np.array(
                        [-1.0] + [1.0] * (poses_2d[0].shape[2] - 1),
                        np.float32)
                    if poses_3d is not None:
                        J3 = poses_3d[0].shape[1]
                        perm3 = np.arange(J3)
                        if joints_left is not None:
                            perm3[list(joints_left)] = joints_right
                            perm3[list(joints_right)] = joints_left
                        self._perm_3d = perm3
                        self._sign_3d = np.array(
                            [-1.0] + [1.0] * (poses_3d[0].shape[2] - 1),
                            np.float32)
            except Exception:
                self._native = None

    def num_frames(self):
        return self.num_batches * self.batch_size

    def batch_num(self):
        return self.num_batches

    def random_state(self):
        return self.random

    def set_random_state(self, random):
        self.random = random

    def augment_enabled(self):
        return self.augment

    def _epoch_order(self):
        """(first_batch, chunk_table) for the epoch being (re)entered: a
        fresh shuffle normally, or the saved mid-epoch position in endless
        mode."""
        if self.state is not None:
            return self.state
        if self.shuffle:
            return 0, self.random.permutation(self.chunks)
        return 0, self.chunks

    def _extract(self, seqs, seq_i, start, end):
        """Chunk [start, end) of seqs[seq_i] with edge padding."""
        seq = seqs[seq_i]
        low = max(start, 0)
        high = min(end, seq.shape[0])
        chunk = seq[low:high]
        pad_left, pad_right = low - start, end - high
        if pad_left or pad_right:
            pad = [(pad_left, pad_right)] + [(0, 0)] * (seq.ndim - 1)
            chunk = np.pad(chunk, pad, "edge")
        return chunk

    def assemble_batch(self, chunks):
        """Assemble one batch from a table slice of (seq, start, end, flip)
        rows: flip augmentation (incl. camera sign flips), edge padding,
        fixed-shape pad_last rows. Pure function of its inputs (fresh output
        arrays; no generator state touched) — safe to call from worker
        threads (the grain pipeline does)."""
        n = len(chunks)
        bs = self.batch_size if self.pad_last else n

        weights = np.zeros((bs,), dtype=np.float32)
        weights[:n] = 1.0

        batch_cam = None
        if self.cameras is not None:
            batch_cam = np.empty((bs, self.cameras[0].shape[-1]),
                                 dtype=np.float32)
            for i, (seq_i, start, end, flip) in enumerate(chunks):
                cam = np.array(self.cameras[int(seq_i)], dtype=np.float32)
                if flip:
                    cam[2] *= -1  # principal point cx
                    cam[7] *= -1  # tangential p1
                batch_cam[i] = cam

        if self._native is not None:
            chunk_arr = np.asarray(chunks, dtype=np.int64).reshape(n, 4)
            batch_2d = np.empty(
                (bs, self.chunk_length) + self.poses_2d[0].shape[1:],
                dtype=np.float32)
            self._native.assemble_chunks(
                self._bank_2d, chunk_arr, self.chunk_length,
                self._perm_2d, self._sign_2d, out=batch_2d[:n])
            batch_3d = None
            if self._bank_3d is not None:
                batch_3d = np.empty(
                    (bs, self.chunk_length) + self.poses_3d[0].shape[1:],
                    dtype=np.float32)
                self._native.assemble_chunks(
                    self._bank_3d, chunk_arr, self.chunk_length,
                    self._perm_3d, self._sign_3d, out=batch_3d[:n])
        else:
            batch_2d = np.empty(
                (bs, self.chunk_length) + self.poses_2d[0].shape[1:],
                dtype=np.float32)
            batch_3d = None
            if self.poses_3d is not None:
                batch_3d = np.empty(
                    (bs, self.chunk_length) + self.poses_3d[0].shape[1:],
                    dtype=np.float32)

            for i, (seq_i, start, end, flip) in enumerate(chunks):
                seq_i, start, end = int(seq_i), int(start), int(end)
                chunk_2d = self._extract(self.poses_2d, seq_i, start, end)
                if flip:
                    chunk_2d = chunk_2d.copy()
                    chunk_2d[..., 0] *= -1
                    chunk_2d[:, self.kps_left + self.kps_right] = chunk_2d[
                        :, self.kps_right + self.kps_left]
                batch_2d[i] = chunk_2d

                if batch_3d is not None:
                    chunk_3d = self._extract(
                        self.poses_3d, seq_i, start, end)
                    if flip:
                        chunk_3d = chunk_3d.copy()
                        chunk_3d[..., 0] *= -1
                        chunk_3d[:, self.joints_left + self.joints_right] = (
                            chunk_3d[:, self.joints_right + self.joints_left])
                    batch_3d[i] = chunk_3d

        if self.pad_last and n < bs:
            # pad rows replicate row 0 (keeps values finite — the
            # masked loss multiplies by 0, and 0*NaN would poison
            # gradients); weights stay 0 -> masked out
            batch_2d[n:] = batch_2d[0]
            if batch_3d is not None:
                batch_3d[n:] = batch_3d[0]
            if batch_cam is not None:
                batch_cam[n:] = batch_cam[0]

        if self.pad_last:
            return batch_cam, batch_3d, batch_2d, weights
        return batch_cam, batch_3d, batch_2d

    def next_epoch(self):
        enabled = True
        while enabled:
            start_idx, table = self._epoch_order()
            for b_i in range(start_idx, self.num_batches):
                chunks = table[b_i * self.batch_size : (b_i + 1) * self.batch_size]
                batch = self.assemble_batch(chunks)
                if self.endless:
                    self.state = (b_i + 1, table)
                yield batch

            if self.endless:
                self.state = None
            else:
                enabled = False


class UnchunkedGenerator:
    """Evaluation generator: one whole sequence per step (+optional flipped
    duplicate). (reference: common/generators.py:174-249; the 3DHP dict
    variant's extra (valid_frame, key) yield is provided via `valid_frames`
    and `keys`.)
    """

    def __init__(self, cameras, poses_3d, poses_2d, pad=0, causal_shift=0,
                 augment=False, kps_left=None, kps_right=None,
                 joints_left=None, joints_right=None,
                 valid_frames=None, keys=None):
        assert poses_3d is None or len(poses_3d) == len(poses_2d)
        assert cameras is None or len(cameras) == len(poses_2d)

        # Unlike the reference (common/generators.py:198 hard-codes
        # self.augment = False and relies on set_augment), the constructor
        # argument is honored here. Callers whose flip TTA is fused inside
        # the sampler (the default eval path) must pass augment=False.
        self.augment = bool(augment)
        self.kps_left = kps_left
        self.kps_right = kps_right
        self.joints_left = joints_left
        self.joints_right = joints_right
        self.pad = pad
        self.causal_shift = causal_shift
        self.cameras = [] if cameras is None else cameras
        self.poses_3d = [] if poses_3d is None else poses_3d
        self.poses_2d = poses_2d
        self.valid_frames = valid_frames
        self.keys = keys

    def num_frames(self):
        return sum(p.shape[0] for p in self.poses_2d)

    def augment_enabled(self):
        return self.augment

    def set_augment(self, augment):
        self.augment = augment

    def next_epoch(self):
        from itertools import zip_longest

        for idx, (seq_cam, seq_3d, seq_2d) in enumerate(
            zip_longest(self.cameras, self.poses_3d, self.poses_2d)
        ):
            batch_cam = None if seq_cam is None else np.expand_dims(seq_cam, 0)
            batch_3d = None if seq_3d is None else np.expand_dims(seq_3d, 0)
            batch_2d = None if seq_2d is None else np.expand_dims(seq_2d, 0)
            if self.augment:
                if batch_cam is not None:
                    batch_cam = np.concatenate((batch_cam, batch_cam), axis=0)
                    batch_cam[1, 2] *= -1
                    batch_cam[1, 7] *= -1
                if batch_3d is not None:
                    batch_3d = np.concatenate((batch_3d, batch_3d), axis=0)
                    batch_3d[1, :, :, 0] *= -1
                    batch_3d[1, :, self.joints_left + self.joints_right] = (
                        batch_3d[1, :, self.joints_right + self.joints_left])
                batch_2d = np.concatenate((batch_2d, batch_2d), axis=0)
                batch_2d[1, :, :, 0] *= -1
                batch_2d[1, :, self.kps_left + self.kps_right] = (
                    batch_2d[1, :, self.kps_right + self.kps_left])

            if self.valid_frames is not None:
                key = self.keys[idx] if self.keys is not None else idx
                yield batch_cam, batch_3d, batch_2d, self.valid_frames[idx], key
            else:
                yield batch_cam, batch_3d, batch_2d


class UnchunkedGeneratorSeq2Seq(UnchunkedGenerator):
    """Unchunked variant that edge-pads both 2D and 3D by pad±causal_shift.

    Parity with the reference's UnchunkedGenerator_Seq2Seq
    (common/generators.py:251-327) — latent in the reference (never used by
    any entry point) but part of its public surface.
    """

    def next_epoch(self):
        from itertools import zip_longest

        for seq_cam, seq_3d, seq_2d in zip_longest(
            self.cameras, self.poses_3d, self.poses_2d
        ):
            pad_spec = ((self.pad + self.causal_shift,
                         self.pad - self.causal_shift), (0, 0), (0, 0))
            batch_cam = None if seq_cam is None else np.expand_dims(seq_cam, 0)
            batch_3d = None if seq_3d is None else np.expand_dims(
                np.pad(seq_3d, pad_spec, "edge"), 0)
            batch_2d = np.expand_dims(np.pad(seq_2d, pad_spec, "edge"), 0)
            if self.augment:
                if batch_cam is not None:
                    batch_cam = np.concatenate((batch_cam, batch_cam), axis=0)
                    batch_cam[1, 2] *= -1
                    batch_cam[1, 7] *= -1
                if batch_3d is not None:
                    batch_3d = np.concatenate((batch_3d, batch_3d), axis=0)
                    batch_3d[1, :, :, 0] *= -1
                    batch_3d[1, :, self.joints_left + self.joints_right] = (
                        batch_3d[1, :, self.joints_right + self.joints_left])
                batch_2d = np.concatenate((batch_2d, batch_2d), axis=0)
                batch_2d[1, :, :, 0] *= -1
                batch_2d[1, :, self.kps_left + self.kps_right] = (
                    batch_2d[1, :, self.kps_right + self.kps_left])
            yield batch_cam, batch_3d, batch_2d
