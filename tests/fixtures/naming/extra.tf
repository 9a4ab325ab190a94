# Cross-file rows: a clean name and a type-echoing snake name — the
# lint must aggregate across the whole corpus, not per file.

resource "aws_security_group" "main" {
  name = "sg-main"
}

resource "aws_sqs_queue" "retry_queue_2" {
  name = "retry-2"
}
