from .state import TrainState, create_train_state, make_optimizer
from .step import InpaintingTrainStep


def make_training_model(config, run_dir='.', kind=None):
    """API-parity factory (reference trainers/__init__.py:13-22): build the
    training orchestrator from a composed config. kind='default' -> the
    InpaintingTrainer (our functional analogue of
    DefaultInpaintingTrainingModule + Lightning)."""
    from .trainer import InpaintingTrainer
    kind = kind or (config.select('training_model.kind')
                    if hasattr(config, 'select') else 'default') or 'default'
    if kind != 'default':
        raise ValueError(f'Unknown trainer module kind {kind}')
    return InpaintingTrainer(config, run_dir)


def load_checkpoint(train_config, path, strict=True, map_location=None):
    """API-parity loader (reference trainers/__init__.py:25-30): build the
    generator from a train config and load weights from an orbax dir or a
    reference torch .ckpt. Returns (generator module, variables)."""
    del strict, map_location  # accepted for signature parity
    import jax
    import jax.numpy as jnp

    from ..models import make_generator
    from .checkpoint import load_generator_variables
    from .convert import load_torch_checkpoint

    gen_kwargs = dict(train_config.generator)
    generator = make_generator(gen_kwargs.pop('kind'), **gen_kwargs)
    probe = jnp.zeros((1, 64, 64, gen_kwargs.get('input_nc', 4)))
    template = generator.init(jax.random.PRNGKey(0), probe, train=False)
    if str(path).endswith(('.ckpt', '.pth', '.pt')):
        variables = load_torch_checkpoint(str(path), template, generator)
    else:
        variables = load_generator_variables(str(path), template)
    return generator, variables
