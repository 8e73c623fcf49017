from .feature_matching import masked_l1_loss, masked_l2_loss, feature_matching_loss
from .adversarial import NonSaturatingWithR1, BCEAdversarialLoss, make_discrim_loss
