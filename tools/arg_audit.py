'''Arg-schema parity audit: diff every recipe's `add_args` names+defaults
against the reference's (`/root/reference/implementations/*/utils.py`,
original/{EDCNN,SEBigGAN} included), without executing either side — both
are AST-parsed, so torch/jax imports never run.

Reference `add_args` semantics (reference utils/argument.py:33-63): value is
`[default]` or `[default, help]`; a bare type object (e.g. `str`) means a
typed optional defaulting to None. The repo uses the same convention
(`animeface_tpu/utils/argument.py:56`).

Deliberate TPU-side deltas are declared in ALLOW (with reasons) — the audit
fails on anything else. Run: `python tools/arg_audit.py` (exit 1 on drift);
tested by tests/test_arg_schema.py.
'''

from __future__ import annotations

import ast
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get('ANIMEFACE_REFERENCE', '/root/reference')

#: recipe -> reference utils.py path fragment (default <name>/utils.py)
REF_PATH = {
    'EDCNN': 'original/EDCNN/utils.py',
    'SEBigGAN': 'original/SEBigGAN/utils.py',
}

#: args the TPU port adds to EVERY recipe's schema deliberately
GLOBAL_EXTRA = {
    'gp_every': 'reference applies gp every step; TPU lazy-reg cadence knob',
    'num_test': 'sample-grid size exposed where the reference hardcodes 16',
    'mbsd_grouping': 'TPU cross-replica MBSD strategy (strided|contiguous)',
}

#: recipe -> {arg: reason} for deliberate per-recipe deltas.
#: 'missing:<arg>' keys document reference args intentionally absent;
#: 'extra:<arg>' keys document repo args with no reference counterpart;
#: 'default:<arg>' keys document deliberate default changes.
ALLOW = {
    '*': {
        # the reference's global parser flags that are CUDA/torch-specific
        # and replaced by TPU equivalents in utils/argument.py
        'missing:disable_gpu': 'no-GPU flag; TPU backend selection is --mesh',
        'missing:disable_amp': 'bf16-on-TPU is --no-bf16',
    },
    'APA': {
        'extras_note': 'the StyleGAN3 backbone knobs (STYLEGAN3_MODEL_ARGS) '
                       'are exposed so smokes can shrink the model; the '
                       'reference hardcodes the backbone defaults',
        **{f'extra:{k}': 'backbone knob (see extras_note)' for k in (
            'image_channels', 'style_dim', 'num_layers', 'map_num_layers',
            'channels', 'max_channels', 'kernel_size', 'no_pixel_norm',
            'output_scale', 'margin_size', 'first_cutoff', 'first_stopband',
            'last_stopband_rel', 'd_channels', 'd_max_channels',
            'mbsd_group_size', 'mbsd_channels', 'bottom',
            'gaus_filter_size')},
    },
    'BigGAN': {
        'extra:disable_sn': 'ablation switch kept from round 1',
        'extra:disable_attention': 'ablation switch kept from round 1',
        'extra:att_name': "reference Attention('ll') is unconstructable "
                          '(xavier_ on 1-D norm scales raises); exposed '
                          'here with standard norm init',
        'missing:image_channels': 'RGB fixed (reference default 3)',
    },
    'Restormer': {
        'default:g_norm_name': 'accepted for parity; model fixes ln',
        'default:g_act_name': 'accepted for parity; model fixes gelu',
        'missing:image_channels': 'RGB fixed (reference default 3)',
        'missing:d_norm_name': 'D is the shared patch D; bn fixed',
        'missing:d_act_name': 'D is the shared patch D; lrelu fixed',
    },
    'normalizations': {
        'extras_note': 'the reference hardcodes the model config (utils.py:'
                       '169-176, "only normalization layer name as a '
                       'controllable parameter"); the knobs are exposed at '
                       'those values so smokes can shrink the model',
        'extra:channels': 'backbone knob (see extras_note)',
        'extra:style_dim': 'backbone knob (see extras_note)',
        'extra:d_num_scale': 'backbone knob (see extras_note)',
        'extra:d_channels': 'backbone knob (see extras_note)',
    },
    'ConvNeXt': {
        'extra:d_depths': 'reference D constructor default (model.py:174), '
                          'surfaced so smokes can shrink the model',
        'extra:d_dims': 'reference D constructor default (model.py:174), '
                        'surfaced so smokes can shrink the model',
    },
    'PEinGAN': {
        'extra:embed_dim': 'SPE embedding width the reference hardcodes in '
                           'the model; exposed so smokes can shrink it',
        # the TPU synthesis reuses the shared StyleGAN2 modulated blocks
        # (SAME padding, fixed [1,3,3,1] blur, lrelu) — PEinGAN/model.py:11-14
        # documents the pinning; args accepted for CLI parity with
        # reference utils.py:134-144,178-189
        'unused:pad': 'fixed: SAME-padded TPU synthesis; SPE supplies the '
                      'spatial bias (model.py:11)',
        'unused:filter_size': 'fixed: shared StyleGAN2 [1,3,3,1] blur '
                              '(model.py:11)',
        'unused:g_act_name': 'fixed lrelu in the shared modulated blocks '
                             '(model.py:14)',
        'unused:d_act_name': 'fixed lrelu in the shared D blocks '
                             '(model.py:14)',
    },
    'AniGAN': {
        'unused:gp_lambda': 'dead in the reference too — the gp term is '
                            'commented out of D_loss '
                            '(reference AniGAN/utils.py:86)',
    },
    'SinGAN': {
        'unused:test_size': 'dead in the reference too — test_sizes() call '
                            'is commented out '
                            '(reference SinGAN/utils.py:176)',
    },
    'pix2pix': {
        'extra:drop_out': 'reference Generator(drop_out=0.0) constructor '
                          'knob (model.py:53), surfaced on the CLI',
    },
    'TransGAN': {
        'default:g_norm_name': 'accepted for parity; model fixes ln',
        'default:d_norm_name': 'accepted for parity; model fixes ln',
    },
}


def _node_value(node):
    '''AST node -> comparable value. Type objects -> ('type', name);
    non-literal expressions -> ('expr', source-ish repr).'''
    try:
        return ast.literal_eval(node)
    except (ValueError, TypeError, SyntaxError):
        if isinstance(node, ast.Name):
            return ('type', node.id)
        return ('expr', ast.dump(node))


def _shared_dicts():
    '''Registry of module-level `NAME = dict(...)` arg tables across all
    repo recipe utils (e.g. STYLEGAN3_ARGS), for `**NAME` expansion.'''
    registry = {}
    root = os.path.join(REPO, 'animeface_tpu', 'implementations')
    for d in os.listdir(root):
        path = os.path.join(root, d, 'utils.py')
        if not os.path.isfile(path):
            continue
        with open(path) as f:
            tree = ast.parse(f.read(), path)
        for node in ast.walk(tree):
            if (isinstance(node, ast.Assign) and len(node.targets) == 1
                    and isinstance(node.targets[0], ast.Name)
                    and isinstance(node.value, ast.Call)
                    and isinstance(node.value.func, ast.Name)
                    and node.value.func.id == 'dict'):
                registry[node.targets[0].id] = node.value
    # resolve nested **NAME references (e.g. STYLEGAN3_ARGS spreads
    # STYLEGAN3_MODEL_ARGS) to fixpoint
    resolved = {}
    for _ in range(3):
        for name, call in registry.items():
            entry = {}
            for kw in call.keywords:
                if kw.arg is not None:
                    entry[kw.arg] = _first_default(kw.value)
                elif isinstance(kw.value, ast.Name):
                    entry.update(resolved.get(kw.value.id, {}))
            resolved[name] = entry
    return resolved


_SHARED = None


def extract_add_args(path):
    '''{arg_name: default} from every `add_args(parser, dict(...))` or
    `add_args(parser, {...})` call in the file. `**NAME` entries expand
    from the module-level shared-table registry.'''
    global _SHARED
    if _SHARED is None:
        _SHARED = _shared_dicts()
    with open(path) as f:
        tree = ast.parse(f.read(), path)
    out = {}
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Call)
                and ((isinstance(node.func, ast.Name)
                      and node.func.id == 'add_args')
                     or (isinstance(node.func, ast.Attribute)
                         and node.func.attr == 'add_args'))):
            continue
        for arg in node.args:
            if isinstance(arg, ast.Name):   # add_args(parser, SHARED_ARGS)
                out.update(_SHARED.get(arg.id, {}))
            elif isinstance(arg, ast.Call) and isinstance(arg.func, ast.Name) \
                    and arg.func.id == 'dict':
                for kw in arg.keywords:
                    if kw.arg is not None:
                        out[kw.arg] = _first_default(kw.value)
                    elif isinstance(kw.value, ast.Name):   # **SHARED_ARGS
                        out.update(_SHARED.get(kw.value.id, {}))
            elif isinstance(arg, ast.Dict):
                for k, v in zip(arg.keys, arg.values):
                    if isinstance(k, ast.Constant):
                        out[k.value] = _first_default(v)
    return out


def _first_default(value_node):
    '''`[default, help?]` list node -> default value.'''
    if isinstance(value_node, (ast.List, ast.Tuple)) and value_node.elts:
        return _node_value(value_node.elts[0])
    return _node_value(value_node)


def audit(recipe):
    '''-> list of drift strings (empty = parity modulo allowlist).'''
    ref_frag = REF_PATH.get(recipe, f'{recipe}/utils.py')
    ref_path = os.path.join(REF, 'implementations', ref_frag)
    repo_path = os.path.join(REPO, 'animeface_tpu', 'implementations',
                             recipe, 'utils.py')
    if not os.path.exists(ref_path):
        return [f'{recipe}: no reference utils at {ref_path}']
    ref_args = extract_add_args(ref_path)
    repo_args = extract_add_args(repo_path)
    allowed = {**ALLOW.get('*', {}), **ALLOW.get(recipe, {})}

    drift = []
    for name, default in sorted(ref_args.items()):
        if name not in repo_args:
            if f'missing:{name}' not in allowed:
                drift.append(f'{recipe}: reference arg --{name} '
                             f'(default {default!r}) is missing')
        elif repo_args[name] != default:
            if f'default:{name}' not in allowed:
                drift.append(f'{recipe}: --{name} default drifted: '
                             f'reference {default!r} vs repo '
                             f'{repo_args[name]!r}')
    for name in sorted(set(repo_args) - set(ref_args)):
        if name not in GLOBAL_EXTRA and f'extra:{name}' not in allowed:
            drift.append(f'{recipe}: repo-only arg --{name} '
                         f'(default {repo_args[name]!r}) is undeclared')
    return drift


def _attr_reads(recipe, _seen=None):
    '''Every attribute name read anywhere in the recipe package (plus
    getattr(x, 'name') constants) — the membership set for the wiring
    audit. Follows imports of sibling implementation packages (ADA/APA
    consume the backbone args inside implementations/StyleGAN3; Restormer
    reuses NAFNet's loop). Coarse by design: it cannot prove an arg steers
    behavior, but it catches the accepted-and-never-referenced class
    exactly.'''
    if _seen is None:
        _seen = set()
    if recipe in _seen:
        return set()
    _seen.add(recipe)
    names = set()
    siblings = set()
    root = os.path.join(REPO, 'animeface_tpu', 'implementations', recipe)
    for fname in os.listdir(root):
        if not fname.endswith('.py'):
            continue
        with open(os.path.join(root, fname)) as f:
            tree = ast.parse(f.read(), fname)
        for node in ast.walk(tree):
            if isinstance(node, ast.Attribute):
                names.add(node.attr)
            elif (isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Name)
                    and node.func.id == 'getattr' and len(node.args) >= 2
                    and isinstance(node.args[1], ast.Constant)):
                names.add(node.args[1].value)
            elif isinstance(node, (ast.Import, ast.ImportFrom)):
                mod = getattr(node, 'module', None) or ''
                for alias in getattr(node, 'names', []):
                    for dotted in (mod, alias.name):
                        parts = dotted.split('.')
                        if (len(parts) >= 3
                                and parts[:2] == ['animeface_tpu',
                                                  'implementations']
                                and parts[2] != recipe):
                            siblings.add(parts[2])
    for sib in siblings:
        if os.path.isdir(os.path.join(
                REPO, 'animeface_tpu', 'implementations', sib)):
            names |= _attr_reads(sib, _seen)
    return names


def wiring_audit(recipe):
    '''VERDICT r4 item 5: flag schema args that are parsed but never read
    past parsing (`args.<name>` / getattr never appears in the recipe
    package). Hits must be implemented or declared with an
    `unused:<arg>` ALLOW entry explaining why acceptance-only is correct.'''
    repo_path = os.path.join(REPO, 'animeface_tpu', 'implementations',
                             recipe, 'utils.py')
    schema = extract_add_args(repo_path)
    reads = _attr_reads(recipe)
    allowed = {**ALLOW.get('*', {}), **ALLOW.get(recipe, {})}
    drift = []
    for raw in sorted(schema):
        # argparse converts dashes to underscores in the Namespace dest
        name = raw.replace('-', '_')
        if name in reads:
            continue
        if f'unused:{name}' in allowed:
            continue
        drift.append(f'{recipe}: --{name} is accepted but never read past '
                     f'parsing (no args.{name} / getattr in the recipe '
                     f'package); wire it or declare unused:{name} in ALLOW')
    return drift


def all_recipes():
    root = os.path.join(REPO, 'animeface_tpu', 'implementations')
    return sorted(d for d in os.listdir(root)
                  if os.path.isfile(os.path.join(root, d, 'utils.py')))


def main():
    recipes = sys.argv[1:] or all_recipes()
    total = []
    for recipe in recipes:
        total += audit(recipe)
        total += wiring_audit(recipe)
    for line in total:
        print(line)
    print(f'{len(total)} drift(s) across {len(recipes)} recipes',
          file=sys.stderr)
    return 1 if total else 0


if __name__ == '__main__':
    sys.exit(main())
