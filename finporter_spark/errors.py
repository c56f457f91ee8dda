"""Error taxonomy mirroring the reference's 11-case enum.

Reference: /root/reference/Sources/Core/FINporterError.swift:22-34 (cases)
and :37-62 (messages). Each Swift case becomes a Python exception class so
callers can catch either the umbrella ``FINporterError`` or a precise case.
Semantics preserved (SURVEY.md §2C-5): ambiguity is an *error*, never a
silent choice; detect errors are soft (logged by the prospector), decode
errors are hard except per-row rejects.
"""

from __future__ import annotations


class FINporterError(Exception):
    """Umbrella error for the engine (mirrors the Swift enum type)."""


class NotImplementedError_(FINporterError):
    """A schema/format combination the importer does not implement.

    Swift: ``notImplementedError`` (FINporterError.swift:23).
    Named with a trailing underscore to avoid shadowing the builtin.
    """

    def __init__(self, msg: str = "Not implemented.") -> None:
        super().__init__(msg)


class EncodingError(FINporterError):
    """Swift: ``encodingError(String)`` (FINporterError.swift:24)."""

    def __init__(self, msg: str) -> None:
        super().__init__(f"Encoding error: {msg}")


class DecodingError(FINporterError):
    """Swift: ``decodingError(String)`` (FINporterError.swift:25)."""

    def __init__(self, msg: str) -> None:
        super().__init__(f"Decoding error: {msg}")


class DecodingKeyError(FINporterError):
    """A required key was absent in a decoded row.

    Swift: ``decodingKeyError(String)`` (FINporterError.swift:26).
    """

    def __init__(self, key: str) -> None:
        super().__init__(f"Decoding error for key: {key}")
        self.key = key


class NeedExplicitOutputSchema(FINporterError):
    """Importer emits several schemas; the caller must choose one.

    Swift: ``needExplicitOutputSchema([AllocSchema])``
    (FINporterError.swift:27).
    """

    def __init__(self, schemas) -> None:
        self.schemas = list(schemas)
        super().__init__(
            "Need explicit output schema, such as: "
            + ", ".join(str(s) for s in self.schemas)
        )


class TargetSchemaNotSupported(FINporterError):
    """Swift: ``targetSchemaNotSupported([AllocSchema])`` (FINporterError.swift:28)."""

    def __init__(self, schemas) -> None:
        self.schemas = list(schemas)
        super().__init__(
            "Target schema not supported. Supported schemas: "
            + ", ".join(str(s) for s in self.schemas)
        )


class MultipleImportersMatch(FINporterError):
    """Swift: ``multipleImportersMatch([FINporter])`` (FINporterError.swift:29)."""

    def __init__(self, importers) -> None:
        self.importers = list(importers)
        super().__init__(
            "Multiple importers match: "
            + ", ".join(getattr(i, "id_", str(i)) for i in self.importers)
        )


class MultipleDetectedSchemasMatch(FINporterError):
    """Swift: ``multipleDetectedSchemasMatch([AllocSchema])`` (FINporterError.swift:30)."""

    def __init__(self, schemas) -> None:
        self.schemas = list(schemas)
        super().__init__(
            "Multiple detected schemas match: "
            + ", ".join(str(s) for s in self.schemas)
        )


class MultipleOutputSchemasMatch(FINporterError):
    """Swift: ``multipleOutputSchemasMatch([AllocSchema])`` (FINporterError.swift:31)."""

    def __init__(self, schemas) -> None:
        self.schemas = list(schemas)
        super().__init__(
            "Multiple output schemas match: "
            + ", ".join(str(s) for s in self.schemas)
        )


class SourceFormatNotRecognized(FINporterError):
    """Swift: ``sourceFormatNotRecognized`` (FINporterError.swift:32)."""

    def __init__(self) -> None:
        super().__init__("Source format not recognized.")


class ImporterNotRecognized(FINporterError):
    """Swift: ``importerNotRecognized(String)`` (FINporterError.swift:33)."""

    def __init__(self, importer_id: str) -> None:
        self.importer_id = importer_id
        super().__init__(f"Importer not recognized: {importer_id}")


ALL_ERROR_CASES = [
    NotImplementedError_,
    EncodingError,
    DecodingError,
    DecodingKeyError,
    NeedExplicitOutputSchema,
    TargetSchemaNotSupported,
    MultipleImportersMatch,
    MultipleDetectedSchemasMatch,
    MultipleOutputSchemasMatch,
    SourceFormatNotRecognized,
    ImporterNotRecognized,
]
