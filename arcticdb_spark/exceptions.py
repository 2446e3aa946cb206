"""Exception-name compatibility with the reference's ``arcticdb.exceptions``.

The reference exposes one exception class per error CATEGORY (its
``error_code.hpp:30-36`` ErrorCategory enum, re-exported through
``python/arcticdb/exceptions.py``) plus a handful of Python-side classes in
``version_store/library.py:71-79``. User code written against the reference
catches these names; this module maps every one of them onto (or under) this
engine's live exception types so those handlers work unchanged.

Classes this engine actually raises (``catalog.py``):
ArcticException, NoSuchVersionException, SortingException,
UnsortedDataException, SchemaException, ArcticDbNotYetImplemented,
MissingKeysInStageResultsError, ExpressionError (``expr.py``). The remaining
names exist so ``except <name>:`` blocks and ``isinstance`` checks from
reference code keep compiling and keep their subclass relationships; the
engine's error messages carry the reference's ``E_*`` codes (e.g.
E_UNSORTED_DATA, E_DESCRIPTOR_MISMATCH) where the reference's do.
"""

from __future__ import annotations

from enum import Enum

from arcticdb_spark.catalog import (ArcticDbNotYetImplemented,
                                    UserInputException,
                                    ArcticDuplicateSymbolsInBatchException,
                                    ArcticException,
                                    ArcticInvalidApiUsageException,
                                    ArcticUnsupportedDataTypeException,
                                    MissingKeysInStageResultsError,
                                    NoSuchVersionException, SchemaException,
                                    SortingException, UnsortedDataException)

# old reference spellings (exceptions.py:19-24)
ArcticNativeException = ArcticException
ArcticNativeNotYetImplemented = ArcticDbNotYetImplemented


class InternalException(ArcticException):
    """ErrorCategory.INTERNAL."""


class NormalizationException(ArcticException):
    """ErrorCategory.NORMALIZATION — input cannot be normalized to the
    storage model."""


class MissingDataException(ArcticException):
    """ErrorCategory.MISSING_DATA."""


class StorageException(ArcticException):
    """ErrorCategory.STORAGE."""


class CompatibilityException(ArcticException):
    """ErrorCategory.COMPATIBILITY."""


class CodecException(ArcticException):
    """ErrorCategory.CODEC — no custom codecs here (parquet handles
    encoding), kept for name parity."""


class StreamDescriptorMismatch(SchemaException):
    """Reference arcticdb_ext.version_store.StreamDescriptorMismatch: the
    engine raises SchemaException with an E_DESCRIPTOR_MISMATCH message for
    the same cases; subclassing keeps both catchable."""


class NoDataFoundException(MissingDataException):
    """Reference arcticdb_ext.storage.NoDataFoundException."""


class DuplicateKeyException(StorageException):
    """E_DUPLICATE_KEY."""


class PermissionException(StorageException):
    """E_PERMISSION."""


class LmdbMapFullError(StorageException):
    """E_LMDB_MAP_FULL — cannot occur here (no LMDB map), kept for name
    parity with lmdb:// URI users."""


from arcticdb_spark.catalog import LibraryNotFound  # noqa: E402 — the
# canonical class lives in catalog (raised by Arctic.get_library)


class MismatchingLibraryOptions(ArcticException):
    pass


class LmdbOptionsError(ArcticException):
    pass


class UnknownLibraryOption(ArcticException):
    pass


class UnsupportedLibraryOptionValue(ArcticException):
    pass


class DataTooNestedException(UserInputException):
    pass


class UnsupportedKeyInDictionary(UserInputException):
    pass


class ErrorCategory(Enum):
    """Reference ``error_code.hpp:26-36`` (re-exported at package top level
    like the reference's ``from arcticdb_ext.exceptions import ErrorCategory``)."""
    INTERNAL = 1
    NORMALIZATION = 2
    MISSING_DATA = 3
    SCHEMA = 4
    STORAGE = 5
    SORTING = 6
    USER_INPUT = 7
    COMPATIBILITY = 8
    CODEC = 9


class ErrorCode(Enum):
    """Reference ``error_code.hpp:57-120`` ARCTIC_ERROR_CODES. The engine
    embeds the relevant ``E_*`` names in its error messages; the enum gives
    reference code something to compare them against."""
    E_INVALID_RANGE = 1000
    E_INVALID_ARGUMENT = 1001
    E_ASSERTION_FAILURE = 1002
    E_RUNTIME_ERROR = 1003
    E_STORED_CONFIG_ERROR = 1004
    E_NOT_SUPPORTED = 1005
    E_INCOMPATIBLE_OBJECTS = 2000
    E_UNIMPLEMENTED_INPUT_TYPE = 2001
    E_UPDATE_NOT_SUPPORTED = 2002
    E_INCOMPATIBLE_INDEX = 2003
    E_WRONG_SHAPE = 2004
    E_COLUMN_SECONDARY_TYPE_MISMATCH = 2005
    E_UNIMPLEMENTED_COLUMN_SECONDARY_TYPE = 2006
    E_NO_SUCH_VERSION = 3000
    E_NO_SYMBOL_DATA = 3001
    E_UNREADABLE_SYMBOL_LIST = 3010
    E_DESCRIPTOR_MISMATCH = 4000
    E_COLUMN_DOESNT_EXIST = 4001
    E_UNSUPPORTED_COLUMN_TYPE = 4002
    E_UNSUPPORTED_INDEX_TYPE = 4003
    E_OPERATION_NOT_SUPPORTED_WITH_PICKLED_DATA = 4004
    E_OPERATION_NOT_SUPPORTED_WITH_RECURSIVE_NORMALIZED_DATA = 4005
    E_OPERATION_NOT_SUPPORTED_WITH_NUMPY_ARRAY = 4006
    E_KEY_NOT_FOUND = 5000
    E_DUPLICATE_KEY = 5001
    E_SYMBOL_NOT_FOUND = 5002
    E_PERMISSION = 5003
    E_RESOURCE_NOT_FOUND = 5004
    E_UNSUPPORTED_ATOMIC_OPERATION = 5005
    E_LMDB_MAP_FULL = 5010
    E_UNEXPECTED_LMDB_ERROR = 5011
    E_UNEXPECTED_S3_ERROR = 5020
    E_S3_RETRYABLE = 5021
    E_ATOMIC_OPERATION_FAILED = 5022
    E_NOT_IMPLEMENTED_BY_STORAGE = 5023
    E_BAD_REQUEST = 5024
    E_QUOTA_EXCEEDED = 5025
    E_UNEXPECTED_AZURE_ERROR = 5030
    E_MONGO_BULK_OP_NO_REPLY = 5050
    E_UNEXPECTED_MONGO_ERROR = 5051
    E_MONGO_RETRYABLE = 5052
    E_NON_INCREASING_INDEX_VERSION = 5090
    E_UNSORTED_DATA = 6000
    E_INVALID_USER_ARGUMENT = 7000
    E_INVALID_DECIMAL_STRING = 7001
    E_INVALID_CHAR_IN_NAME = 7002
    E_NAME_TOO_LONG = 7003
    E_NO_STAGED_SEGMENTS = 7004
    E_COLUMN_NOT_FOUND = 7005
    E_SORT_ON_SPARSE = 7006
    E_EMPTY_NAME = 7007
    E_STAGE_RESULT_WITH_INCORRECT_SYMBOL = 7008
    E_DUPLICATE_COLUMN = 7009
    E_UNRECOGNISED_COLUMN_STATS_VERSION = 8000
    E_DECODE_ERROR = 9000
    E_UNKNOWN_CODEC = 9001
    E_ZSDT_ENCODING = 9002
    E_LZ4_ENCODING = 9003
    E_INPUT_TOO_LARGE = 9004
    E_ENCODING_VERSION_MISMATCH = 9005
