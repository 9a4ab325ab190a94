variable "region" {
  type        = string
  description = "Deployment region"
  default     = "us-west-2"
}

variable "db_password" {
  type        = string
  description = "Master database password"
  sensitive   = true
}

# no type, no description: the lint case this audit exists to flag
variable "instance_count" {
  default = 2
}

variable "tags" {
  description = "Common resource tags"
  default     = {}
}
