"""Linear normalizers for actions/observations.

Functional re-design of the reference's ``LinearNormalizer`` /
``SingleFieldLinearNormalizer`` (model/common/normalizer.py:12-371): same fit
semantics ("limits" range-to-[-1,1] and "gaussian", per-final-dim stats,
range_eps constant-channel guard), but plain numpy dataclasses instead of
nn.ParameterDict — scale/offset become compile-time constants under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Optional, Union

import jax.numpy as jnp
import numpy as np

ArrayLike = Union[np.ndarray, "jnp.ndarray"]


@dataclasses.dataclass
class NormalizerField:
    scale: np.ndarray
    offset: np.ndarray
    input_stats: Dict[str, np.ndarray]

    def normalize(self, x: ArrayLike) -> ArrayLike:
        xp = jnp if not isinstance(x, np.ndarray) else np
        src_shape = x.shape
        x = x.reshape(-1, self.scale.shape[0])
        out = x * self.scale + self.offset
        return out.reshape(src_shape)

    def unnormalize(self, x: ArrayLike) -> ArrayLike:
        src_shape = x.shape
        x = x.reshape(-1, self.scale.shape[0])
        out = (x - self.offset) / self.scale
        return out.reshape(src_shape)

    @classmethod
    def identity(cls, dim: int = 1) -> "NormalizerField":
        return cls(
            scale=np.ones(dim, np.float32),
            offset=np.zeros(dim, np.float32),
            input_stats={
                "min": -np.ones(dim, np.float32),
                "max": np.ones(dim, np.float32),
                "mean": np.zeros(dim, np.float32),
                "std": np.ones(dim, np.float32),
            },
        )

    @classmethod
    def image_range(cls) -> "NormalizerField":
        """[0, 1] -> [-1, 1] (normalize_util.get_image_range_normalizer)."""
        return cls(
            scale=np.asarray([2.0], np.float32),
            offset=np.asarray([-1.0], np.float32),
            input_stats={
                "min": np.asarray([0.0], np.float32),
                "max": np.asarray([1.0], np.float32),
                "mean": np.asarray([0.5], np.float32),
                "std": np.asarray([np.sqrt(1 / 12)], np.float32),
            },
        )


def fit_field(
    data: np.ndarray,
    last_n_dims: int = 1,
    mode: str = "limits",
    output_max: float = 1.0,
    output_min: float = -1.0,
    range_eps: float = 1e-4,
    fit_offset: bool = True,
) -> NormalizerField:
    assert mode in ("limits", "gaussian")
    assert output_max > output_min
    data = np.asarray(data, dtype=np.float32)
    dim = int(np.prod(data.shape[-last_n_dims:])) if last_n_dims > 0 else 1
    flat = data.reshape(-1, dim)

    input_min = flat.min(axis=0)
    input_max = flat.max(axis=0)
    input_mean = flat.mean(axis=0)
    input_std = flat.std(axis=0, ddof=1)

    if mode == "limits":
        if fit_offset:
            input_range = input_max - input_min
            ignore = input_range < range_eps
            input_range = np.where(ignore, output_max - output_min, input_range)
            scale = (output_max - output_min) / input_range
            offset = output_min - scale * input_min
            offset = np.where(
                ignore, (output_max + output_min) / 2 - input_min, offset
            )
        else:
            assert output_max > 0 and output_min < 0
            output_abs = min(abs(output_min), abs(output_max))
            input_abs = np.maximum(np.abs(input_min), np.abs(input_max))
            ignore = input_abs < range_eps
            input_abs = np.where(ignore, output_abs, input_abs)
            scale = output_abs / input_abs
            offset = np.zeros_like(input_mean)
    else:  # gaussian
        ignore = input_std < range_eps
        scale = 1.0 / np.where(ignore, 1.0, input_std)
        offset = -input_mean * scale if fit_offset else np.zeros_like(input_mean)

    return NormalizerField(
        scale=scale.astype(np.float32),
        offset=offset.astype(np.float32),
        input_stats={
            "min": input_min,
            "max": input_max,
            "mean": input_mean,
            "std": input_std,
        },
    )


@dataclasses.dataclass
class LinearNormalizer:
    fields: Dict[str, NormalizerField] = dataclasses.field(default_factory=dict)

    def __getitem__(self, key: str) -> NormalizerField:
        return self.fields[key]

    def __contains__(self, key: str) -> bool:
        return key in self.fields

    def fit(
        self,
        data: Mapping[str, np.ndarray],
        last_n_dims: int = 1,
        mode: str = "limits",
        **kwargs,
    ) -> None:
        for k, v in data.items():
            self.fields[k] = fit_field(v, last_n_dims=last_n_dims, mode=mode, **kwargs)

    def normalize(self, d: Mapping[str, ArrayLike]) -> Dict[str, ArrayLike]:
        return {k: self.fields[k].normalize(v) for k, v in d.items()}

    def unnormalize(self, d: Mapping[str, ArrayLike]) -> Dict[str, ArrayLike]:
        return {k: self.fields[k].unnormalize(v) for k, v in d.items()}

    # -- persistence --------------------------------------------------------

    def to_flat_dict(self) -> Dict[str, np.ndarray]:
        out = {}
        for k, f in self.fields.items():
            out[f"{k}.scale"] = f.scale
            out[f"{k}.offset"] = f.offset
            for sk, sv in f.input_stats.items():
                out[f"{k}.input_stats.{sk}"] = sv
        return out

    @classmethod
    def from_flat_dict(cls, flat: Mapping[str, np.ndarray]) -> "LinearNormalizer":
        fields: Dict[str, NormalizerField] = {}
        names = sorted({k.split(".")[0] for k in flat})
        for name in names:
            fields[name] = NormalizerField(
                scale=np.asarray(flat[f"{name}.scale"]),
                offset=np.asarray(flat[f"{name}.offset"]),
                input_stats={
                    sk: np.asarray(flat[f"{name}.input_stats.{sk}"])
                    for sk in ("min", "max", "mean", "std")
                    if f"{name}.input_stats.{sk}" in flat
                },
            )
        return cls(fields)

    def save(self, path: str) -> None:
        np.savez(path, **self.to_flat_dict())

    @classmethod
    def load(cls, path: str) -> "LinearNormalizer":
        with np.load(path) as z:
            return cls.from_flat_dict(dict(z))

    @classmethod
    def from_torch_state_dict(cls, sd: Mapping[str, np.ndarray]) -> "LinearNormalizer":
        """Parse the reference's serialized normalizer (keys like
        ``params_dict.action.scale``, nested ParameterDict layout)."""
        flat = {}
        for k, v in sd.items():
            parts = k.split(".")
            if parts[0] == "params_dict":
                parts = parts[1:]
            flat[".".join(parts)] = np.asarray(v)
        return cls.from_flat_dict(flat)
