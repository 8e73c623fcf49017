"""torch state_dict ↔ flax pytree checkpoint conversion.

Loads reference PyTorch LaMa checkpoints (e.g. big-lama `models/best.ckpt`,
whose `state_dict` keys look like `generator.model.5.conv1.ffc.convg2g.conv1.0.weight`
— see reference bin/make_checkpoint.py:44-52 and trainers/__init__.py:25-30)
into our NHWC flax parameter trees.

Because our linen modules mirror the torch module tree with '.'→'_' name
mangling (model_5 / conv1_0 / model0_0), conversion is mechanical:

  flax path                      torch key                 transform
  ('model_1','ffc','convl2l','kernel')  model.1.ffc.convl2l.weight  OIHW→HWIO
  ('model_24','kernel')  [ConvT]        model.24.weight             IOHW→HWIO
  ('model_25','scale')   [BN]           model.25.weight             copy
  (... ,'bn','mean') [batch_stats]      ....bn.running_mean         copy
  ('se','fc_0','kernel') [Dense]        se.fc.0.weight              (O,I)→(I,O)

Layout conversions: NCHW torch conv weights (O,I,kh,kw) → HWIO; torch
ConvTranspose2d weights (I,O,kh,kw) → HWIO (I=in, O=out) matching
ops/conv.py::ConvTranspose2d. Which paths are transposed convs cannot be
inferred from shapes, so each model class declares them via
`transposed_conv_paths(model)`.
"""
import re
from typing import Any, Dict, Iterable, Optional, Sequence, Set, Tuple

import numpy as np


# --------------------------------------------------------------------- naming

def flax_path_to_torch_key(path: Sequence[str], leaf: str) -> str:
    """('model_5','conv1','ffc','convg2g','conv1_0'), 'kernel' ->
    'model.5.conv1.ffc.convg2g.conv1.0.weight'."""
    parts = []
    for p in path:
        # every trailing _<digits> becomes a torch sequential index:
        # model_5 -> model.5 ; conv1_0 -> conv1.0 ; model0_0 -> model0.0 ;
        # conv_block_1 -> conv_block.1 ; bn_l stays bn_l
        m = re.match(r'^(.*?)_(\d+)$', p)
        if m:
            parts.append(f'{m.group(1)}.{m.group(2)}')
        else:
            parts.append(p)
    leaf_map = {'kernel': 'weight', 'scale': 'weight', 'bias': 'bias',
                'mean': 'running_mean', 'var': 'running_var', 'angle': 'angle'}
    return '.'.join(parts + [leaf_map[leaf]])


def transposed_conv_paths_ffc_generator(n_downsampling: int, n_blocks: int,
                                        out_ffc: bool = False) -> Set[str]:
    """Torch sequential indices of ConvTranspose2d entries in
    FFCResNetGenerator (reference ffc.py:348-354)."""
    base = 3 + n_downsampling + n_blocks  # first upsample index
    return {f'model_{base + 3 * i}' for i in range(n_downsampling)}


def transposed_conv_paths_global_generator(n_downsampling: int, n_blocks: int,
                                           extra_blocks: int = 0) -> Set[str]:
    """GlobalGenerator (reference pix2pixhd.py:425-431): indices
    4+3*n_down+n_blocks+extra .. step 3."""
    base = 4 + 3 * n_downsampling + n_blocks + extra_blocks
    return {f'model_{base + 3 * i}' for i in range(n_downsampling)}


def transposed_conv_paths(model) -> Set[str]:
    from ..models.ffc import FFCResNetGenerator
    from ..models.pix2pixhd import GlobalGenerator, MultiDilatedGlobalGenerator
    if isinstance(model, FFCResNetGenerator):
        return transposed_conv_paths_ffc_generator(model.n_downsampling, model.n_blocks,
                                                   model.out_ffc)
    if isinstance(model, (GlobalGenerator, MultiDilatedGlobalGenerator)):
        n_extra = 0
        if isinstance(model, GlobalGenerator):
            n_extra = (model.dilated_blocks_n + model.dilated_blocks_n_start +
                       model.dilated_blocks_n_middle + len(model.ffc_positions or []))
        else:
            n_extra = len(model.ffc_positions or [])
        return transposed_conv_paths_global_generator(model.n_downsampling,
                                                      model.n_blocks, n_extra)
    return set()


# ----------------------------------------------------------------- flat trees

def _flatten(tree: Dict, prefix=()) -> Iterable[Tuple[Tuple[str, ...], Any]]:
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _unflatten(items: Dict[Tuple[str, ...], Any]) -> Dict:
    out: Dict = {}
    for path, v in items.items():
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return out


def _is_dense_path(path: Tuple[str, ...]) -> bool:
    # SELayer fc_0 / fc_2 are the only Dense layers in the model zoo
    return path and path[-1].startswith('fc_')


# --------------------------------------------------------------- conversions

def flax_to_torch(variables: Dict, model=None, prefix: str = '') -> Dict[str, np.ndarray]:
    """Export {'params':…, 'batch_stats':…} to a torch-layout state_dict
    (numpy values). Inverse of `torch_to_flax`."""
    tconv = transposed_conv_paths(model) if model is not None else set()
    out: Dict[str, np.ndarray] = {}
    params = variables.get('params', {})
    stats = variables.get('batch_stats', {})

    for path, leaf_val in _flatten(params):
        *mpath, leaf = path
        v = np.asarray(leaf_val)
        if leaf == 'kernel':
            if v.ndim == 4:
                if mpath and mpath[-1] in tconv or (mpath and mpath[0] in tconv and len(mpath) == 1):
                    v = np.transpose(v, (2, 3, 0, 1))  # HWIO -> (I,O,kh,kw)
                else:
                    v = np.transpose(v, (3, 2, 0, 1))  # HWIO -> (O,I,kh,kw)
            elif v.ndim == 2:
                v = np.transpose(v, (1, 0))  # Dense (I,O) -> (O,I)
        out[prefix + flax_path_to_torch_key(mpath, leaf)] = v

    for path, leaf_val in _flatten(stats):
        *mpath, leaf = path
        out[prefix + flax_path_to_torch_key(mpath, leaf)] = np.asarray(leaf_val)
    return out


def torch_to_flax(state_dict: Dict[str, Any], template: Dict, model=None,
                  prefix: str = '', strict: bool = True) -> Dict:
    """Fill a flax variables template ({'params':…, 'batch_stats':…}) from a
    torch state_dict. `prefix` strips e.g. 'generator.' from checkpoint keys.
    Values may be torch tensors or numpy arrays."""
    tconv = transposed_conv_paths(model) if model is not None else set()

    def to_np(v):
        if hasattr(v, 'detach'):
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    new_params = {}
    missing = []
    for path, leaf_val in _flatten(template.get('params', {})):
        *mpath, leaf = path
        key = prefix + flax_path_to_torch_key(mpath, leaf)
        if key not in state_dict:
            missing.append(key)
            new_params[path] = leaf_val
            continue
        v = to_np(state_dict[key])
        if leaf == 'kernel':
            if v.ndim == 4:
                if mpath and (mpath[-1] in tconv or mpath[0] in tconv and len(mpath) == 1):
                    v = np.transpose(v, (2, 3, 0, 1))  # (I,O,kh,kw) -> HWIO
                else:
                    v = np.transpose(v, (2, 3, 1, 0))  # (O,I,kh,kw) -> HWIO
            elif v.ndim == 2:
                v = np.transpose(v, (1, 0))
        expected = np.asarray(leaf_val).shape
        assert v.shape == tuple(expected), (key, v.shape, expected)
        new_params[path] = v.astype(np.asarray(leaf_val).dtype)

    new_stats = {}
    for path, leaf_val in _flatten(template.get('batch_stats', {})):
        *mpath, leaf = path
        key = prefix + flax_path_to_torch_key(mpath, leaf)
        if key not in state_dict:
            missing.append(key)
            new_stats[path] = leaf_val
            continue
        new_stats[path] = to_np(state_dict[key]).astype(np.float32)

    if strict and missing:
        raise KeyError(f'{len(missing)} keys missing from state_dict, e.g. {missing[:5]}')

    result = {'params': _unflatten(new_params)}
    if 'batch_stats' in template:
        result['batch_stats'] = _unflatten(new_stats)
    return result


def load_torch_checkpoint(path: str, generator_template: Dict, generator_model,
                          map_key: str = 'generator.') -> Dict:
    """Load a reference .ckpt/.pth (torch serialization) and extract the
    generator variables. Works with deployment checkpoints produced by the
    reference bin/make_checkpoint.py (state under ['state_dict'])."""
    import torch
    state = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(state, dict) and 'state_dict' in state:
        state = state['state_dict']
    return torch_to_flax(state, generator_template, model=generator_model,
                         prefix=map_key)
