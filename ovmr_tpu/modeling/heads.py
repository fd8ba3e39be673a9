"""Classification heads (reference ``dassl/modeling/head/mlp.py``)."""

from __future__ import annotations

from typing import Sequence, Union

import flax.linen as nn

from ovmr_tpu.utils.registry import Registry

HEAD_REGISTRY = Registry("HEAD")


@HEAD_REGISTRY.register()
class mlp(nn.Module):
    """Linear(+BN)(+act)(+dropout) stack; features out = last hidden dim."""

    in_features: int = 2048
    hidden_layers: Union[int, Sequence[int]] = ()
    activation: str = "relu"
    bn: bool = True
    dropout: float = 0.0

    @property
    def out_features(self) -> int:
        dims = self._dims()
        assert len(dims) > 0
        return dims[-1]

    def _dims(self):
        h = self.hidden_layers
        return (h,) if isinstance(h, int) else tuple(h)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.activation == "relu":
            act = nn.relu
        elif self.activation == "leaky_relu":
            act = lambda v: nn.leaky_relu(v, 0.01)
        else:
            raise NotImplementedError(self.activation)
        for i, dim in enumerate(self._dims()):
            x = nn.Dense(dim, name=f"fc{i}")(x)
            if self.bn:
                from .layers import TorchBatchNorm

                x = TorchBatchNorm(
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-5, name=f"bn{i}",
                )(x)
            x = act(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


def build_head(name: str, verbose: bool = False, **kwargs) -> nn.Module:
    if verbose:
        print(f"Head: {name}")
    kwargs.pop("pretrained", None)
    return HEAD_REGISTRY.get(name)(**kwargs)
