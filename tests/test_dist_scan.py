"""dist_scan on the 8-virtual-device mesh vs the single-chip scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sortx
from sortx.parallel import shard_1d


def _oracle(x, inclusive=False):
    incl = np.cumsum(x.astype(np.uint64)) & 0xFFFFFFFF
    out = incl if inclusive else incl - x
    return (out & 0xFFFFFFFF).astype(np.uint32)


@pytest.mark.parametrize("n", [1024, 2**17, 2**20, 2**20 + 7, 8 * 1024 + 13])
def test_dist_scan_matches_oracle(rng, n):
    mesh = sortx.make_sort_mesh()
    x = rng.randint(0, 16, size=n).astype(np.uint32)
    out, total = sortx.dist_scan(jnp.asarray(x), with_total=True, mesh=mesh)
    expect = _oracle(x)
    assert np.array_equal(np.asarray(out), expect)
    assert int(total) == int((x.astype(np.uint64).sum()) & 0xFFFFFFFF)


def test_dist_scan_matches_single_chip(rng):
    # Bit-identical to sortx.scan regardless of the mesh.
    n = 2**18 + 13
    mesh = sortx.make_sort_mesh()
    x = rng.randint(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    a = sortx.dist_scan(jnp.asarray(x), mesh=mesh)
    b = sortx.scan(jnp.asarray(x))
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_dist_scan_sharded_input(rng):
    mesh = sortx.make_sort_mesh()
    n = 8 * 4096
    x = rng.randint(0, 100, size=n).astype(np.int32)
    xs = shard_1d(jnp.asarray(x), mesh)
    out = sortx.dist_scan(xs, mesh=mesh)
    assert np.array_equal(np.asarray(out),
                          _oracle(x.view(np.uint32)).view(np.int32))
    # Even n: the result stays evenly sharded over the mesh.
    assert len(out.sharding.device_set) == mesh.shape["x"]


def test_dist_scan_inclusive_and_d1(rng):
    n = 4096 + 5
    x = rng.randint(0, 1000, size=n).astype(np.uint32)
    mesh1 = sortx.make_sort_mesh(n_devices=1)
    out = sortx.dist_scan(jnp.asarray(x), inclusive=True, mesh=mesh1)
    assert np.array_equal(np.asarray(out), _oracle(x, inclusive=True))


def test_dist_scan_wraparound(rng):
    mesh = sortx.make_sort_mesh()
    x = np.full(8 * 2048, 0xF0000000, np.uint32)   # forces mod-2^32 wraps
    out, total = sortx.dist_scan(jnp.asarray(x), with_total=True, mesh=mesh)
    expect = _oracle(x)
    assert np.array_equal(np.asarray(out), expect)
    assert int(total) == int((x.astype(np.uint64).sum()) & 0xFFFFFFFF)


def test_dist_scan_validation():
    with pytest.raises(TypeError):
        sortx.dist_scan(jnp.zeros((8,), jnp.float32))
    with pytest.raises(ValueError):
        sortx.dist_scan(jnp.zeros((2, 4), jnp.uint32))
    e = jnp.zeros((0,), jnp.uint32)
    out, t = sortx.dist_scan(e, with_total=True)
    assert out.shape == (0,) and int(t) == 0
