from .masks import (DrawMethod, DumbAreaMaskGenerator, MixedMaskGenerator,
                    OutpaintingMaskGenerator, RandomIrregularMaskGenerator,
                    RandomRectangleMaskGenerator, RandomSuperresMaskGenerator,
                    get_mask_generator, make_random_irregular_mask,
                    make_random_rectangle_mask, make_random_superres_mask)
