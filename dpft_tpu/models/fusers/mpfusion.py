"""Iterative multi-perspective fusion transformer (flax).

Parity: reference src/dprt/models/fusers/mpfusion.py:16-749.

 - MLFusion: one decoder block for one view: query self-attention ->
   multi-scale deformable cross-attention over that view's feature levels ->
   FFN, each with residual + dropout and optional LayerNorm.
 - MPFusion: one MLFusion per view; the per-view query outputs are stacked
   (B, N, C, V) and reduced (mean / max / unary / linear / cross-attn / ffn).
 - IMPFusion: learnable query features + query positional embedding; per
   iteration the current box centers are projected into every view to build
   normalized reference points, MPFusion fuses, and a per-iteration head
   refines the boxes. Heads are independent per iteration (the reference
   deepcopies the head, mpfusion.py:585,601-611).

Reference-point projection (reference mpfusion.py:617-696): optional rigid
transformation followed by cart2spher (radar views), projective matrix,
perspective divide where w != 0, normalization by the raw input (H, W), and
a [0, 1] clip. The `transformation.any()` data-dependent branch is realized
as a jnp.where over both computed paths (tiny point sets, so computing both
is free and keeps the graph static).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dpft_tpu.models.layers.attention import MultiheadAttention
from dpft_tpu.models.layers.common import (
    get_activation, torch_linear_kernel_init, torch_linear_bias_init,
)
from dpft_tpu.models.layers.ms_deform_attn import MSDeformAttn
from dpft_tpu.ops.transforms import cart2spher


def with_pos_embed(tensor: jnp.ndarray,
                   pos: Optional[jnp.ndarray]) -> jnp.ndarray:
    return tensor if pos is None else tensor + pos


def _dense(features, in_features, name, use_bias=True, dtype=jnp.float32):
    return nn.Dense(features, use_bias=use_bias,
                    kernel_init=torch_linear_kernel_init,
                    bias_init=torch_linear_bias_init(in_features),
                    dtype=dtype, name=name)


class MLFusion(nn.Module):
    """Single-view multi-level fusion block (reference MLFusion)."""

    d_model: int = 256
    d_ffn: int = 1024
    n_levels: int = 1
    n_heads: int = 1
    n_points: int = 1
    activation: str = "ReLU"
    dropout: float = 0.0
    norm: bool = False
    # Mixed precision: matmuls/attention in `dtype` (params stay float32);
    # LayerNorms are pinned to float32 for numerical stability.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self,
                 query: jnp.ndarray,
                 levels: Dict[str, jnp.ndarray],
                 reference_points: jnp.ndarray,
                 query_positions: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """
        Arguments:
            query: (B, N, d_model) query features.
            levels: dict of (B, H_l, W_l, d_model) feature maps (n_levels).
            reference_points: (B, N, 2) normalized (u, v).
            query_positions: (B, N, d_model) query positional embedding.
        """
        det = deterministic

        # --- Self-attention over queries.
        qk = with_pos_embed(query, query_positions)
        attn = MultiheadAttention(self.d_model, self.n_heads,
                                  dropout=self.dropout, dtype=self.dtype,
                                  name="self_attn")(
            qk, qk, query, deterministic=det)
        out = query + nn.Dropout(self.dropout)(attn, deterministic=det)
        if self.norm:
            out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                               name="norm1")(out)

        # --- Deformable cross-attention over this view's feature levels.
        spatial_shapes = tuple(
            (v.shape[1], v.shape[2]) for v in levels.values())
        flat = jnp.concatenate(
            [v.reshape(v.shape[0], -1, v.shape[-1]) for v in levels.values()],
            axis=1)
        ref = jnp.repeat(reference_points[:, :, None, :],
                         len(spatial_shapes), axis=2)
        cross = MSDeformAttn(self.d_model, len(spatial_shapes), self.n_heads,
                             self.n_points, dtype=self.dtype,
                             name="ms_deform_attn")(
            with_pos_embed(out, query_positions), ref, flat, spatial_shapes)
        out = out + nn.Dropout(self.dropout)(cross, deterministic=det)
        if self.norm:
            out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                               name="norm2")(out)

        # --- Feed-forward.
        act = get_activation(self.activation)
        h = _dense(self.d_ffn, self.d_model, "ffn1", dtype=self.dtype)(out)
        h = nn.Dropout(self.dropout)(act(h), deterministic=det)
        h = _dense(self.d_model, self.d_ffn, "ffn2", dtype=self.dtype)(h)
        out = out + nn.Dropout(self.dropout)(h, deterministic=det)
        if self.norm:
            out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                               name="norm3")(out)

        return out


class MPFusion(nn.Module):
    """Multi-perspective fusion: per-view MLFusion + reduction."""

    m_views: int
    d_model: int = 256
    d_ffn: int = 1024
    n_levels: Sequence[int] = None
    n_heads: Sequence[int] = None
    n_points: Sequence[int] = None
    activation: str = "ReLU"
    dropout: float = 0.0
    norm: bool = False
    reduction: str = "mean"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self,
                 query: jnp.ndarray,
                 batch: List[Dict[str, jnp.ndarray]],
                 reference_points: List[jnp.ndarray],
                 query_positions: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        if self.reduction not in {"mean", "max", "unary", "linear",
                                  "cross-attn", "ffn"}:
            raise ValueError(f"Invalid reduction: {self.reduction}")

        n_levels = self.n_levels or [1] * self.m_views
        n_heads = self.n_heads or [1] * self.m_views
        n_points = self.n_points or [1] * self.m_views

        views = []
        for v in range(self.m_views):
            views.append(MLFusion(
                self.d_model, self.d_ffn, n_levels[v], n_heads[v],
                n_points[v], self.activation, self.dropout, self.norm,
                dtype=self.dtype, name=f"ms_deform_attn{v}")(
                    query, batch[v], reference_points[v], query_positions,
                    deterministic))
        queries = jnp.stack(views, axis=-1)  # (B, N, C, V)

        B, N = query.shape[:2]
        CV = self.d_model * self.m_views

        if self.reduction == "mean":
            return jnp.mean(queries, axis=-1)
        if self.reduction == "max":
            return jnp.max(queries, axis=-1)
        if self.reduction in {"unary", "linear"}:
            # (B, N, C, V) -> (B, N, C*V) row-major (c-major, v-minor),
            # identical to the reference's .view ordering.
            return _dense(self.d_model, CV, "reduction", use_bias=False,
                          dtype=self.dtype)(queries.reshape(B, N, CV))
        if self.reduction == "cross-attn":
            kv = queries.reshape(B, N, CV)
            return MultiheadAttention(
                self.d_model, min(n_heads), dropout=self.dropout,
                kdim=CV, vdim=CV, dtype=self.dtype, name="reduction")(
                with_pos_embed(query, query_positions), kv, kv,
                deterministic=deterministic)
        # 'ffn' reduction (residual block, reference mpfusion.py:450-470)
        act = get_activation(self.activation)
        q = queries.reshape(B, N, CV)
        out = _dense(CV, CV, "red_ffn1", dtype=self.dtype)(q)
        out = nn.Dropout(self.dropout)(act(out), deterministic=deterministic)
        out = _dense(self.d_model, CV, "red_ffn2", dtype=self.dtype)(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        down = _dense(self.d_model, CV, "red_downsample",
                      dtype=self.dtype)(q)
        out = down + out
        if self.norm:
            out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                               name="red_norm1")(out)
        return out


def get_reference_points(query: jnp.ndarray,
                         transformation: jnp.ndarray,
                         projection: jnp.ndarray,
                         shape: jnp.ndarray) -> jnp.ndarray:
    """Projects query centers (B, N, 3) into a view's normalized (u, v).

    Arguments:
        transformation: (B, 4, 4) rigid transform; if (element-wise) all
            zero the transform+spherical conversion is skipped (camera
            views store a zero matrix, reference dataset.py:205-207).
        projection: (B, R, 4) projective matrix (R = 3 for radar raster
            projections, 4 for camera calibration matrices).
        shape: (B, 2) raw input (H, W) used for normalization.

    Returns:
        (B, N, 2) reference points (u, v) clipped to [0, 1].
    """
    ones = jnp.ones_like(query[..., :1])
    homo = jnp.concatenate([query[..., :3], ones], axis=-1)  # (B, N, 4)

    # Transformed path: rigid transform then cartesian -> spherical (deg).
    # The reference skips this branch entirely for zero matrices (python
    # `if transformation.any()`, mpfusion.py:647); here both branches are
    # traced, so the unselected branch's inputs must be made safe first:
    # cart2spher of the all-zero camera-transform output has sqrt(0) /
    # arctan2(0,0) whose BACKWARD is NaN, and jnp.where does not block
    # NaN cotangents from the untaken side.
    use_transform = jnp.any(transformation != 0)
    tq = jnp.einsum("bij,bkj->bki", transformation, homo)
    tq = jnp.where(use_transform, tq, jnp.ones_like(tq))
    r, phi, roh = cart2spher(tq[..., 0], tq[..., 1], tq[..., 2], degrees=True)
    spher = jnp.stack([r, phi, roh], axis=-1)

    pts = jnp.where(use_transform, spher, query[..., :3])

    homo2 = jnp.concatenate([pts, ones], axis=-1)
    proj = jnp.einsum("bij,bkj->bki", projection, homo2)  # (B, N, R)

    w_coord = proj[..., 2]
    nonzero = w_coord != 0
    w_safe = jnp.where(nonzero, w_coord, 1.0)
    u = jnp.where(nonzero, proj[..., 0] / w_safe, proj[..., 0])
    v = jnp.where(nonzero, proj[..., 1] / w_safe, proj[..., 1])

    u = u / shape[:, 1:2]
    v = v / shape[:, 0:1]

    return jnp.clip(jnp.stack([u, v], axis=-1), 0.0, 1.0)


class IMPFusion(nn.Module):
    """Iterative multi-perspective fusion decoder with box refinement."""

    i_iter: int = 1
    m_views: int = 1
    d_model: int = 256
    d_ffn: int = 1024
    n_queries: int = 100
    n_levels: Sequence[int] = None
    n_heads: Sequence[int] = None
    n_points: Sequence[int] = None
    activation: str = "ReLU"
    dropout: float = 0.0
    norm: bool = False
    reduction: str = "mean"
    head: Optional[nn.Module] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self,
                 batch: List[Dict[str, jnp.ndarray]],
                 shape: List[jnp.ndarray],
                 projection: List[Tuple[jnp.ndarray, jnp.ndarray]],
                 out: Dict[str, jnp.ndarray],
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """
        Arguments:
            batch: per-view dicts of (B, H, W, d_model) feature levels.
            shape: per-view (B, 2) raw input (H, W).
            projection: per-view (transformation (B, 4, 4),
                projection (B, R, 4)) matrices.
            out: {'center': (B, N, 3)} initial reference points.
        """
        B = out["center"].shape[0]

        # Learnable query features, init U(0, 1) (torch nn.init.uniform_
        # default, reference mpfusion.py:570,591-594,613-615).
        query = self.param(
            "query",
            lambda key, s: jax.random.uniform(key, s, jnp.float32),
            (self.n_queries, self.d_model))
        query = jnp.broadcast_to(query[None], (B,) + query.shape)

        # Query positional embedding, init N(0, 1) (torch nn.Embedding).
        query_pos = self.param(
            "query_embedding", nn.initializers.normal(stddev=1.0),
            (self.n_queries, self.d_model))
        query_pos = jnp.broadcast_to(query_pos[None], (B,) + query_pos.shape)

        for it in range(self.i_iter):
            reference_points = [
                get_reference_points(out["center"][..., :3], p[0], p[1], s)
                for p, s in zip(projection, shape)
            ]
            query = MPFusion(
                self.m_views, self.d_model, self.d_ffn, self.n_levels,
                self.n_heads, self.n_points, self.activation, self.dropout,
                self.norm, self.reduction, dtype=self.dtype,
                name=f"fusion{it}")(
                    query, batch, reference_points, query_pos, deterministic)
            # Independent head per iteration (reference deepcopies the head
            # template, mpfusion.py:585,601-611): re-instantiate the module
            # class with the template's config so each gets its own params.
            head_kwargs = {
                f.name: getattr(self.head, f.name)
                for f in dataclasses.fields(self.head)
                if f.name not in ("parent", "name")
            }
            head = type(self.head)(name=f"head{it}", **head_kwargs)
            out = head(query, out, deterministic=deterministic)

        return out


def build_mpfusion(config: Dict[str, Any], head=None) -> IMPFusion:
    from dpft_tpu.models.layers.common import get_compute_dtype
    if config.get("pallas_msda") == "mm":
        # Fused Pallas kernel for the MATMUL levels of the hybrid core
        # (ops/pallas/deform_attn_mm.py) — Mosaic-lowerable on real TPU
        # (the matmul form has no gathers); gather levels stay on XLA.
        from dpft_tpu.ops.deform_attn import set_msda_backend
        set_msda_backend("pallas_mm")
    elif config.get("pallas_msda"):
        # Route the parameter-free sampling core through the Pallas
        # kernel (ops/pallas/deform_attn.py). Interpreter-mode only:
        # Mosaic cannot lower the kernel's gathers on real TPU (see the
        # module docstring; Mosaic gather = full-lane take_along_axis
        # only), so reject the config early instead of failing later
        # with a cryptic per-shape lowering error mid-compile.
        import jax
        if jax.default_backend() != "cpu":
            raise ValueError(
                "fuser.pallas_msda is interpreter-mode only: Mosaic "
                "cannot lower the kernel's lane gathers on TPU "
                "(ops/pallas/deform_attn.py docstring has the measured "
                "detail); use the default XLA core on this backend.")
        from dpft_tpu.ops.deform_attn import set_msda_backend
        set_msda_backend("pallas")
    return IMPFusion(
        dtype=get_compute_dtype(config),
        i_iter=config.get("i_iter", 1),
        m_views=config.get("m_views", 1),
        d_model=config.get("d_model", 256),
        d_ffn=config.get("d_ffn", 1024),
        n_queries=config.get("n_queries", 100),
        n_levels=tuple(config["n_levels"]) if config.get("n_levels") else None,
        n_heads=tuple(config["n_heads"]) if config.get("n_heads") else None,
        n_points=tuple(config["n_points"]) if config.get("n_points") else None,
        activation=config.get("activation", "ReLU"),
        dropout=config.get("dropout", 0.0),
        norm=config.get("norm", False),
        reduction=config.get("reduction", "mean"),
        head=head,
    )
