'''Layered argparse system.

Parity with reference `utils/argument.py`: `get_default_parser` (:10) global flags,
`add_args` (:33) declarative {name: [default, help]} builder (bool -> store_true only,
list -> nargs='*', a bare type -> typed optional), `save_args` (:65) JSON run-config dump.

TPU-specific additions: --mesh (device-mesh axis sizes for data/model parallelism),
--bf16/--no-bf16 replaces the reference's AMP flags, --data-root replaces the
hard-coded /usr/src/data mounts, --synthetic-data for dataset-free smoke runs.
'''

from __future__ import annotations

import datetime
import json
import os
from argparse import ArgumentParser

from animeface_tpu.utils.misc import EasyDict

# repo-root-relative implementations dir (reference hard-codes /usr/src/implementations)
IMPLEMENTATIONS_DIR = os.environ.get(
    'ANIMEFACE_IMPLEMENTATIONS_DIR',
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                 'animeface_tpu', 'implementations'))


def get_default_parser() -> ArgumentParser:
    parser = ArgumentParser()
    parser.add_argument('name')

    default_args = EasyDict()
    default_args.image_size     = [128, 'Size of image.']
    default_args.batch_size     = [32, 'Global batch size (split across data-parallel devices)']
    default_args.dataset        = ['animeface', 'Dataset name']
    default_args.min_year       = [2005, 'Minimum of generated year. Ignored when dataset==danbooru']
    default_args.num_images     = [60000, 'Number of images in training set. Ignored when dataset==animeface']
    default_args.save           = [1000, 'Interval for saving the model / sample grids']
    default_args.max_iters      = [-1, 'Max training iterations. If < 0, derived from --default-epochs']
    default_args.default_epochs = [100, 'Used to calculate max iterations when --max-iters < 0']
    default_args.log_file       = [str, 'Filename for saving log output']
    default_args.log_interval   = [1, 'Interval for logging to log file']
    default_args.debug          = [False, 'Debug mode (rich console, verbose)']
    # TPU-native flags (no GPU/AMP toggles: bf16-on-TPU replaces GradScaler AMP)
    default_args.seed           = [0, 'PRNG seed']
    default_args.data_root      = ['/usr/src/data', 'Root directory holding the datasets']
    default_args.synthetic_data = [False, 'Use procedurally generated data (no dataset required)']
    default_args.device_data    = [False, 'Keep the whole dataset resident in device memory (uint8), '
                                          'gather+decode batches on device; for datasets that fit HBM']
    default_args.mesh           = [[-1], 'Device mesh shape, data axis first; -1 = all devices data-parallel']
    default_args.multihost      = [False, 'Initialize jax.distributed for multi-host (pod-slice) execution; '
                                          'see parallel/multihost.py for the launch contract']
    default_args.no_bf16        = [False, 'Disable bfloat16 compute (use float32)']
    default_args.resume         = [str, 'Checkpoint directory to resume training from']
    default_args.profile        = [False, 'Capture a jax profiler trace of a few steps']

    return add_args(parser, default_args)


def add_args(parser: ArgumentParser, arg_defaults: dict,
             prefix: str = '--', under_score: bool = False) -> ArgumentParser:
    '''{name: [default] | [default, help]} -> argparse options.

    Type is inferred from the default: int/float/str pass through; bool becomes
    store_true (default must be falsy); list/tuple becomes nargs='*' typed by the
    first element; a bare type object becomes a typed optional defaulting to None.
    '''
    for k, v in arg_defaults.items():
        option = prefix + (k if under_score else k.replace('_', '-'))

        if len(v) == 1:
            default, help = v[0], ''
        elif len(v) == 2:
            default, help = v
        else:
            raise Exception('arg_defaults value must be [default] or [default, help]')

        value_type = type(default)
        if value_type in (float, int, str):
            parser.add_argument(option, default=default, type=value_type, help=help)
        elif value_type is bool:
            if default:
                raise Exception('Only supports store_true action')
            parser.add_argument(option, default=default, action='store_true', help=help)
        elif value_type in (list, tuple):
            ele_type = type(default[0])
            parser.add_argument(option, default=list(default), type=ele_type, nargs='*', help=help)
        elif isinstance(default, type):
            parser.add_argument(option, default=None, type=default, help=help)

    return parser


def result_dir(name: str) -> str:
    '''Per-implementation output directory (reference: implementations/<name>/result).'''
    d = os.path.join(IMPLEMENTATIONS_DIR, name, 'result')
    os.makedirs(d, exist_ok=True)
    return d


def save_args(args, identify: bool = True, id: str | None = None) -> str:
    args_dict = {k: v for k, v in vars(args).items()}
    if identify:
        if id is None:
            id = datetime.datetime.now().strftime('%Y%m%d%H%M%S')
        args_file = f'args-{id}.json'
    else:
        args_file = 'args.json'
    filename = os.path.join(result_dir(args.name), args_file)
    with open(filename, 'w', encoding='utf-8') as fout:
        json.dump(args_dict, fout, indent=2, default=str)
    return filename
