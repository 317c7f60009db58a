from .infer import detect_contacts, ContactDetector
