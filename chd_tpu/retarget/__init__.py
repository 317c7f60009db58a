from .mixamo import retarget, softmin, softmax
