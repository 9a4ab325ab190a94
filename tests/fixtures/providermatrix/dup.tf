# a second terraform block declaring an already-declared provider: the
# matrix must aggregate, not fan out duplicate rows per name
terraform {
  required_providers {
    random = ">= 3.5"
  }
}
