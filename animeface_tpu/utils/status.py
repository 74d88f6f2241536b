'''Training status / metrics tracker.

API parity with reference `utils/status.py:14` (`Status.update/is_end/plot_loss/
state_dict/load_state_dict/log_*`), TPU-adapted:
  * `update(**losses)` accepts python floats OR jax scalars; device sync is
    deferred until the value is actually formatted (postfix/log step), so a
    loop that only logs every `log_interval` steps never blocks on D2H.
  * `log_gpu` -> `log_device`: dumps `jax.devices()` + per-device memory stats.
'''

from __future__ import annotations

import datetime
import logging
import pprint
import time
import warnings

from tqdm import tqdm


def _tofloat(v) -> float:
    try:
        return float(v)
    except Exception:
        return float('nan')


class Status:
    def __init__(self, max_iters: int, bar: bool = True, log_file: str | None = None,
                 log_interval: int = 1, logger_name: str = 'logger') -> None:
        if bar:
            self.bar = tqdm(total=max_iters)
        self._max_iters = max_iters
        self._batches_done = 0
        self._loss = None
        self._log_file = log_file
        if log_file is not None:
            logging.basicConfig(
                filename=log_file, filemode='w',
                format='%(asctime)s:%(filename)s:%(levelname)s: %(message)s')
            self._logger = logging.getLogger(logger_name)
            self._logger.setLevel(logging.DEBUG)
        self._log_interval = log_interval
        self._step_start = time.time()

    @property
    def max_iters(self):
        return self._max_iters

    @property
    def batches_done(self):
        return self._batches_done

    @batches_done.setter
    def batches_done(self, value):
        self._batches_done = value

    def print(self, *args, **kwargs):
        if hasattr(self, 'bar'):
            tqdm.write(*args, **kwargs)
        else:
            print(*args, **kwargs)

    def log(self, message, level='info'):
        if hasattr(self, '_logger'):
            getattr(self._logger, level)(message)
        else:
            warnings.warn('No Logger. Printing to stdout.')
            self.print(message)

    # ---- information loggers ----

    def log_args(self, args):
        self.log(f'Command line arguments\n{pprint.pformat(vars(args))}')

    def log_jax(self):
        import jax
        self.log(f'JAX {jax.__version__} backend={jax.default_backend()} '
                 f'devices={jax.devices()}')

    # reference-name alias (`log_torch`)
    log_torch = log_jax

    def log_models(self, *models):
        for model in models:
            self.log(f'Architecture: {model.__class__.__name__}\n{model}')

    def log_device(self):
        import jax
        lines = []
        for d in jax.devices():
            try:
                stats = d.memory_stats()
                used = stats.get('bytes_in_use', 0) / 2**20
                lim = stats.get('bytes_limit', 0) / 2**20
                lines.append(f'{d}: {used:.0f}MiB / {lim:.0f}MiB')
            except Exception:
                lines.append(f'{d}: (no memory stats)')
        self.log('Devices:\n' + '\n'.join(lines))

    log_gpu = log_device  # reference-name alias

    def log_training(self, args, *models):
        self.log_args(args)
        self.log_jax()
        self.log_models(*models)

    # ---- a step ----

    def update(self, **kwargs) -> None:
        if self._loss is None:
            self._init_loss(kwargs.keys())

        should_log = (self._log_file is not None
                      and self.batches_done % self._log_interval == 0)
        show_bar = hasattr(self, 'bar')

        postfix = []
        logged = {}
        for k, v in kwargs.items():
            if should_log or show_bar:
                v = _tofloat(v)  # D2H sync happens here, only when displayed
                postfix.append(f'{k} : {v:.5f}')
                logged[k] = round(v, 6)
            # setdefault: a key may first appear mid-run (e.g. a metric only
            # emitted on some cadence branches), giving uneven series lengths
            self._loss.setdefault(k, []).append(v)

        if should_log:
            duration = time.time() - self._step_start
            eta_sec = int((self.max_iters - self.batches_done) * duration)
            eta = datetime.timedelta(seconds=eta_sec)
            self.log(f'STEP: {self.batches_done} / {self.max_iters} '
                     f'INFO: {logged} ETA: {eta}')
        if self.batches_done == 0 and self._log_file is not None:
            self.log_device()

        self.batches_done += 1
        self._step_start = time.time()

        if show_bar:
            self.bar.set_postfix_str(' '.join(postfix))
            self.bar.update(1)

    def is_end(self):
        return self.batches_done >= self.max_iters

    def loss_tail(self, window: int) -> dict:
        '''Public view of the last `window` logged values per series, as
        floats (forces the deferred D2H sync for just those values). Series
        may have uneven lengths when a key first appears mid-run.'''
        if self._loss is None:
            return {}
        return {k: [_tofloat(v) for v in vs[-window:]]
                for k, vs in self._loss.items()}

    def load_state_dict(self, state_dict: dict) -> None:
        '''fast-forward after checkpoint resume'''
        self._loss = state_dict['loss']
        self.batches_done = state_dict['batches_done']
        if self.batches_done > 0 and hasattr(self, 'bar'):
            self.bar.update(self.batches_done)

    def state_dict(self) -> dict:
        loss = None
        if self._loss is not None:
            loss = {k: [_tofloat(v) for v in vs] for k, vs in self._loss.items()}
        return dict(loss=loss, batches_done=self.batches_done)

    def _init_loss(self, keys):
        self._loss = {key: [] for key in keys}

    def plot_loss(self, filename='loss'):
        try:
            import matplotlib
            matplotlib.use('agg')
            import matplotlib.pyplot as plt
        except ImportError:
            warnings.warn('Could not import matplotlib.')
            return
        plt.figure(figsize=(12, 8))
        legends = []
        for key, values in self._loss.items():
            legends.append(key)
            plt.plot([_tofloat(v) for v in values])
        plt.xlabel('iteration')
        plt.ylabel('loss')
        plt.legend(legends, loc='upper right')
        plt.tight_layout()
        plt.savefig(filename)
        plt.close()

    def __str__(self):
        if self._loss is None:
            return 'Loss untracked.'
        string = [f'Batch : {self.batches_done}\t']
        for k, v in self._loss.items():
            string.append(f'{k} : {_tofloat(v[-1]):.5f}')
        return ' '.join(string)
