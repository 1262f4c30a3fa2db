"""Pure-NumPy LSTM autoencoder (reference M5, torch-free).

Re-implements the semantics of the reference's sequence embedder
(reference src/models/LSTM_Autoencoder.py:5-98 and
notebooks/LSTM_features_learning.ipynb cells 17-20) without PyTorch:

- Encoder: single-layer LSTM over the (scaled, padded) sequence; the final
  per-sequence hidden state, LayerNorm'd, is the embedding.
- Decoder: the embedding repeated ``max_len`` times drives a second LSTM;
  a linear head projects each step back to feature space.
- Loss: MSE over the *valid* (unpadded) timesteps only.
- Optimizer: AdamW (decoupled weight decay), shuffled mini-batches.

The corpus this trains on is tiny (hundreds to low-thousands of short
sequences — one row per product), so training runs driver-side in NumPy;
the 100 TB story is train-on-a-sample here, score distributed via the
Arrow path in ``ml/autoencoder.py``. Everything is seeded: same data +
same seed ⇒ bit-identical weights and embeddings.

This is an independent implementation: forward/backward are hand-derived
standard LSTM/BPTT equations, not a port of any framework's autograd.
"""

from __future__ import annotations

import numpy as np

_LN_EPS = 1e-5  # LayerNorm epsilon (matches the reference default)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


def pad_batch(seqs: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Stack variable-length (T_i, F) arrays into (B, T_max, F) + lengths."""
    lengths = np.array([len(s) for s in seqs], dtype=np.int64)
    t_max = int(lengths.max())
    n_feat = seqs[0].shape[1]
    out = np.zeros((len(seqs), t_max, n_feat), dtype=np.float64)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out, lengths


class LSTMAutoencoderNP:
    """Encoder-decoder LSTM with masked-MSE training, in NumPy.

    Parameters mirror the reference config (hidden=12, AdamW 2e-3 / 5e-4,
    batch 16); ``epochs`` is a fit() argument so callers trade training
    time for reconstruction quality explicitly.
    """

    def __init__(self, input_size: int, hidden_size: int = 12, seed: int = 2):
        self.F = input_size
        self.H = hidden_size
        rng = np.random.default_rng(seed)
        self._shuffle_rng = np.random.default_rng(seed + 1)
        H, Fdim = hidden_size, input_size
        k_enc = 1.0 / np.sqrt(H)

        def u(shape, k):
            return rng.uniform(-k, k, size=shape)

        # Gate layout along axis 0: [input, forget, cell, output] (4H rows).
        self.params = {
            "W_enc": u((4 * H, Fdim + H), k_enc),
            "b_enc": u((4 * H,), k_enc),
            "W_dec": u((4 * H, H + H), k_enc),
            "b_dec": u((4 * H,), k_enc),
            "W_out": u((Fdim, H), 1.0 / np.sqrt(H)),
            "b_out": u((Fdim,), 1.0 / np.sqrt(H)),
            "ln_g": np.ones(H),
            "ln_b": np.zeros(H),
        }
        self._adam_m = {k: np.zeros_like(v) for k, v in self.params.items()}
        self._adam_v = {k: np.zeros_like(v) for k, v in self.params.items()}
        self._adam_t = 0

    # ------------------------------------------------------------------ LSTM

    @staticmethod
    def _cell_forward(xh, c_prev, W, b, H):
        z = xh @ W.T + b
        i = _sigmoid(z[:, :H])
        f = _sigmoid(z[:, H : 2 * H])
        g = np.tanh(z[:, 2 * H : 3 * H])
        o = _sigmoid(z[:, 3 * H :])
        c = f * c_prev + i * g
        tc = np.tanh(c)
        h = o * tc
        return h, c, (xh, c_prev, i, f, g, o, tc)

    @staticmethod
    def _cell_backward(dh, dc, cache, W, H):
        xh, c_prev, i, f, g, o, tc = cache
        do = dh * tc
        dc = dc + dh * o * (1.0 - tc * tc)
        di = dc * g
        df = dc * c_prev
        dg = dc * i
        dc_prev = dc * f
        dz = np.concatenate(
            [
                di * i * (1.0 - i),
                df * f * (1.0 - f),
                dg * (1.0 - g * g),
                do * o * (1.0 - o),
            ],
            axis=1,
        )
        dW = dz.T @ xh
        db = dz.sum(axis=0)
        dxh = dz @ W
        return dxh, dc_prev, dW, db

    # ------------------------------------------------------------- forward

    def _encode_forward(self, X, lengths):
        """Masked encoder pass: state freezes once a sequence has ended, so
        the final (h, c) equal the states at each sequence's own last step
        (same result as packed-sequence evaluation)."""
        B, T, _ = X.shape
        H = self.H
        W, b = self.params["W_enc"], self.params["b_enc"]
        h = np.zeros((B, H))
        c = np.zeros((B, H))
        caches = []
        for t in range(T):
            m = (t < lengths).astype(np.float64)[:, None]
            xh = np.concatenate([X[:, t, :], h], axis=1)
            h_new, c_new, cache = self._cell_forward(xh, c, W, b, H)
            h = m * h_new + (1.0 - m) * h
            c = m * c_new + (1.0 - m) * c
            caches.append((cache, m))
        # LayerNorm over the hidden axis.
        mu = h.mean(axis=1, keepdims=True)
        var = h.var(axis=1, keepdims=True)
        xhat = (h - mu) / np.sqrt(var + _LN_EPS)
        emb = xhat * self.params["ln_g"] + self.params["ln_b"]
        return emb, (caches, h, xhat, var)

    def _decode_forward(self, emb, T):
        B = emb.shape[0]
        H = self.H
        W, b = self.params["W_dec"], self.params["b_dec"]
        Wo, bo = self.params["W_out"], self.params["b_out"]
        h = np.zeros((B, H))
        c = np.zeros((B, H))
        caches, hs = [], []
        for _ in range(T):
            xh = np.concatenate([emb, h], axis=1)
            h, c, cache = self._cell_forward(xh, c, W, b, H)
            caches.append(cache)
            hs.append(h)
        Hs = np.stack(hs, axis=1)  # (B, T, H)
        Y = Hs @ Wo.T + bo
        return Y, (caches, Hs)

    # ------------------------------------------------------------ backward

    def _backward(self, X, lengths, Y, enc_cache, dec_cache):
        B, T, Fdim = X.shape
        H = self.H
        mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float64)
        n_valid = mask.sum() * Fdim
        diff = (Y - X) * mask[:, :, None]
        loss = float((diff * diff).sum() / n_valid)
        dY = 2.0 * diff / n_valid

        g = {k: np.zeros_like(v) for k, v in self.params.items()}
        dec_caches, Hs = dec_cache
        g["W_out"] = np.einsum("btf,bth->fh", dY, Hs)
        g["b_out"] = dY.sum(axis=(0, 1))
        dHs = dY @ self.params["W_out"]

        # Decoder BPTT; the input at every step is the embedding.
        demb = np.zeros((B, H))
        dh = np.zeros((B, H))
        dc = np.zeros((B, H))
        for t in range(T - 1, -1, -1):
            dxh, dc, dW, db = self._cell_backward(
                dh + dHs[:, t, :], dc, dec_caches[t], self.params["W_dec"], H
            )
            g["W_dec"] += dW
            g["b_dec"] += db
            demb += dxh[:, :H]
            dh = dxh[:, H:]

        # LayerNorm backward.
        enc_caches, h_fin, xhat, var = enc_cache
        g["ln_g"] = (demb * xhat).sum(axis=0)
        g["ln_b"] = demb.sum(axis=0)
        dxhat = demb * self.params["ln_g"]
        inv = 1.0 / np.sqrt(var + _LN_EPS)
        dh = inv * (
            dxhat
            - dxhat.mean(axis=1, keepdims=True)
            - xhat * (dxhat * xhat).mean(axis=1, keepdims=True)
        )

        # Encoder BPTT through the masked freeze updates.
        dc = np.zeros((B, H))
        for t in range(len(enc_caches) - 1, -1, -1):
            cache, m = enc_caches[t]
            dxh, dc_prev, dW, db = self._cell_backward(
                dh * m, dc * m, cache, self.params["W_enc"], H
            )
            g["W_enc"] += dW
            g["b_enc"] += db
            dh = dh * (1.0 - m) + dxh[:, self.F :]
            dc = dc * (1.0 - m) + dc_prev
        return loss, g

    # ------------------------------------------------------------ training

    def _adamw_step(self, grads, lr, weight_decay, beta1=0.9, beta2=0.999, eps=1e-8):
        self._adam_t += 1
        t = self._adam_t
        for k, p in self.params.items():
            gk = grads[k]
            self._adam_m[k] = beta1 * self._adam_m[k] + (1 - beta1) * gk
            self._adam_v[k] = beta2 * self._adam_v[k] + (1 - beta2) * gk * gk
            mhat = self._adam_m[k] / (1 - beta1**t)
            vhat = self._adam_v[k] / (1 - beta2**t)
            p -= lr * (mhat / (np.sqrt(vhat) + eps) + weight_decay * p)

    def fit(
        self,
        seqs: list[np.ndarray],
        epochs: int = 1000,
        batch_size: int = 16,
        lr: float = 2e-3,
        weight_decay: float = 5e-4,
    ) -> list[float]:
        """Train on scaled sequences; returns the per-epoch mean loss."""
        if not seqs:
            # an empty corpus would reach total/nb with nb=0 deep in the
            # epoch loop — fail at the cause instead (review r9)
            raise ValueError("LSTM fit requires at least one training sequence")
        idx = np.arange(len(seqs))
        losses = []
        for _ in range(epochs):
            self._shuffle_rng.shuffle(idx)
            total, nb = 0.0, 0
            for s in range(0, len(idx), batch_size):
                batch = [seqs[i] for i in idx[s : s + batch_size]]
                X, lengths = pad_batch(batch)
                emb, enc_cache = self._encode_forward(X, lengths)
                Y, dec_cache = self._decode_forward(emb, X.shape[1])
                loss, grads = self._backward(X, lengths, Y, enc_cache, dec_cache)
                self._adamw_step(grads, lr, weight_decay)
                total += loss
                nb += 1
            losses.append(total / nb)
        return losses

    # ----------------------------------------------------------- inference

    def encode(self, seqs: list[np.ndarray]) -> np.ndarray:
        X, lengths = pad_batch(seqs)
        emb, _ = self._encode_forward(X, lengths)
        return emb

    def reconstruction_mse(self, seqs: list[np.ndarray]) -> float:
        X, lengths = pad_batch(seqs)
        emb, _ = self._encode_forward(X, lengths)
        Y, _ = self._decode_forward(emb, X.shape[1])
        T = X.shape[1]
        mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float64)
        diff = (Y - X) * mask[:, :, None]
        return float((diff * diff).sum() / (mask.sum() * X.shape[2]))

    # ------------------------------------------------- weight (de)hydration

    def export_weights(self) -> dict[str, np.ndarray]:
        """Plain dict of arrays — broadcastable to executors for scoring."""
        return {k: v.copy() for k, v in self.params.items()}

    @classmethod
    def from_weights(
        cls, weights: dict[str, np.ndarray], input_size: int, hidden_size: int
    ) -> "LSTMAutoencoderNP":
        model = cls(input_size, hidden_size, seed=0)
        for k in model.params:
            model.params[k] = np.asarray(weights[k], dtype=np.float64)
        return model
