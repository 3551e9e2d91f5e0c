from .edt_batch import batch_edt, lower_envelope
