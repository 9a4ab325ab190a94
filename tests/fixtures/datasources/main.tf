data "aws_ami" "ubuntu" {
  most_recent = true
}

data "aws_vpc" "main" {
  default = true
}

data "aws_ami" "stale" {
  most_recent = false
}

data "aws_subnet" "private" {
  vpc_id = data.aws_vpc.main.id
}

resource "aws_instance" "web" {
  ami    = data.aws_ami.ubuntu.id
  subnet = "subnet-123"
}

output "vpc_id" {
  value = data.aws_vpc.main.id
}
